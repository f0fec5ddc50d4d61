"""k-nearest-neighbor search over the padded neural point buffer.

This is the TPU-native replacement for the reference's FAISS GPU IVFFlat
index (src/neural_point.py:37-41,169-215 — top-8 squared L2 + per-query
radius counts). Two strategies:

* ``grid``  — voxel grid-hash stored as a *dense cell table*: four
  component PLANES x/y/z/id, each a (TABLE, C) f32 array whose row [h]
  holds up to C candidates of every point whose cell hashes to bucket h;
  empty slots carry +inf positions so their distances are +inf without any
  masking. Queries gather the neighbor-cell blocks per plane — wide rows
  (C*4 bytes) instead of per-point 12-byte rows, which is the difference
  between ~1 GB/s and near-bandwidth gather throughput on TPU — and select
  top-k by exact squared distance. The plane split (vs one packed
  (TABLE, C, 4) array) feeds the Pallas ray kernel its component-major
  layout directly, removing two materialized transpose copies
  (profiling/knn_layout_micro.py). The ray kernel gathers the id plane at
  probe width alongside the coordinate planes and extracts winner ids
  in-kernel by masked sum — reconstructing ids outside the kernel with a
  flat (R*ns*k) gather lowers to per-element row DMA and costs ~5.7 ms/iter
  at mapping scale (profiling/geo_fwd_split.py). Since only in-radius
  neighbors ever receive interpolation weight (decoder.py:157) and the
  dedup/count tests are radius-bounded, radius-limited candidates are
  semantically sufficient — and this search has *better* recall than the
  reference's IVF nprobe=4/400.

  Layout history: a quad-planar variant (one (TABLE+1, 4, C) array, one
  4C-wide row gather per probe instead of four C-wide gathers) was built
  and MEASURED SLOWER on real TPU — 4.89 vs 4.57 ms/iter mapping-scale
  kNN at 99.98% winner parity — and reverted (round-2); the four separate
  C-wide plane gathers are already at gather-hardware rate and the 4C row
  fetch pays for id-plane bytes on probes that only need coordinates.
* ``brute`` — exact tiled scan with a running top-k merge; used as the test
  oracle and for small clouds.

Returned distances are exact squared L2 (computed from gathered candidate
coordinates, no matmul cancellation error). Invalid slots get D=+inf, I=0.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Large-prime spatial hash (Teschner et al.), int32 wraparound is fine.
_P1, _P2, _P3 = 73856093, 19349669, 83492791


def _hash_cells(cells: jnp.ndarray, table_size: int) -> jnp.ndarray:
    """(.., 3) int32 cell coords -> bucket id in [0, table_size)."""
    h = (cells[..., 0] * _P1) ^ (cells[..., 1] * _P2) ^ (cells[..., 2] * _P3)
    return jax.lax.bitcast_convert_type(h, jnp.uint32).astype(jnp.uint32) % jnp.uint32(table_size)


def _slot_plan(h: jnp.ndarray, table_size: int, c: int,
               base_counts: jnp.ndarray | None = None):
    """Bucket-slot scatter plan shared by the f32-plane and packed builders.

    Returns (order, dst): ``order`` sorts entries by bucket (stable, so
    append order is preserved within a bucket) and ``dst`` is the flat
    plane slot for each sorted entry — bucket*c + rank, with rank offset by
    ``base_counts`` when appending to an existing table. Overflow (rank >=
    c) and invalid entries (h == table_size) park OUT of range so the
    scatter's mode="drop" drops them (parking them in the sentinel row
    would poison its init).
    """
    n = h.shape[0]
    order = jnp.argsort(h, stable=True).astype(jnp.int32)
    hs = h[order]
    ar = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool), hs[1:] != hs[:-1]])
    run_start = jax.lax.associative_scan(jnp.maximum,
                                         jnp.where(is_start, ar, 0))
    rank = ar - run_start
    if base_counts is not None:
        rank = rank + base_counts[hs]
    dst = hs * c + rank
    dst = jnp.where((rank < c) & (hs < table_size), dst, (table_size + 1) * c)
    return order, dst


class GridIndex(NamedTuple):
    """Dense cell-table point index. Shapes are static in (table_size, C).

    The table carries one extra *sentinel* bucket at row ``table_size`` whose
    slots are all +inf — probes masked out (box overflow, hash-duplicate)
    point there and contribute +inf distances with no special-casing.

    Stored as component planes (x, y, z, id), each (TABLE+1, C) f32 with
    ids as float-VALUED integers; empty slots / the sentinel row hold +inf.
    """
    px: jnp.ndarray          # (TABLE+1, C) f32 candidate x
    py: jnp.ndarray
    pz: jnp.ndarray
    pid: jnp.ndarray         # (TABLE+1, C) f32 float-valued point id
    cell_size: jnp.ndarray   # () f32
    counts: jnp.ndarray      # (TABLE+1,) i32 TRUE per-bucket point count
                             # (uncapped; > C means overflow was dropped).
                             # Lets insert_grid_index append new points
                             # without re-sorting the whole cloud.

    @property
    def table_size(self) -> int:
        return self.px.shape[0] - 1

    @property
    def max_per_cell(self) -> int:
        return self.px.shape[1]


@functools.partial(jax.jit, static_argnames=("table_size", "max_per_cell"))
def build_grid_index(points: jnp.ndarray, n_points: jnp.ndarray,
                     cell_size: jnp.ndarray, table_size: int = 1 << 16,
                     max_per_cell: int = 96) -> GridIndex:
    """Build the cell table over the first ``n_points`` rows of ``points``.

    cell_size must be >= the largest query radius that will ever be used with
    this index (the SLAM loop uses the config's max dynamic query radius).
    Points beyond ``max_per_cell`` in one bucket are dropped (the analog of
    the reference's IVF probe-limited recall).
    """
    cap = points.shape[0]
    c = max_per_cell
    valid = jnp.arange(cap) < n_points
    cells = jnp.floor(points / cell_size).astype(jnp.int32)
    h = _hash_cells(cells, table_size).astype(jnp.int32)
    h = jnp.where(valid, h, table_size)
    order, dst = _slot_plan(h, table_size, c)

    pos_sorted = points[order]
    # ids ride as float-VALUED integers (exact for ids < 2^24; capacity is
    # capped at 2^22). Bitcasting int32 bits into f32 is NOT safe here: small
    # ids are denormals and XLA flushes denormals to zero in ops like
    # concatenate.
    # One component plane per scatter; one extra +inf sentinel bucket at row
    # table_size (see GridIndex).
    def plane(vals):
        flat = jnp.full(((table_size + 1) * c,), jnp.inf, jnp.float32)
        flat = flat.at[dst].set(vals.astype(jnp.float32), mode="drop")
        return flat.reshape(table_size + 1, c)

    counts = jnp.zeros((table_size + 1,), jnp.int32).at[
        jnp.where(valid, h, table_size + 1)].add(1, mode="drop")
    return GridIndex(plane(pos_sorted[:, 0]), plane(pos_sorted[:, 1]),
                     plane(pos_sorted[:, 2]), plane(order),
                     jnp.asarray(cell_size, jnp.float32), counts)


@jax.jit
def insert_grid_index(index: GridIndex, points: jnp.ndarray,
                      ids: jnp.ndarray, valid: jnp.ndarray) -> GridIndex:
    """Append a batch of NEW points to an existing cell table.

    BIT-IDENTICAL to build_grid_index over the union, provided every ``id``
    is larger than every id already in the table (the SLAM cloud only ever
    appends — positions receive no gradients, pointcloud.py:add_points):
    the build's stable sort places higher ids after lower ids within a
    bucket, which is exactly where this scatter puts them (slot =
    counts[bucket] + rank-within-batch; rank >= C or bucket overflow parks
    the entry out of range, matching the build's drop rule). Replaces the
    per-densify full rebuild: 27 ms for a 54k-row batch vs 58 ms for the
    CAP-wide (2^19) argsort rebuild on TPU (profiling/map_frame_overhead.py)
    — ~60 ms saved per mapped frame (two densifies), and the gap grows with
    capacity (the rebuild is O(CAP log CAP); this is O(batch)).
    """
    if isinstance(index, FusedGridIndex):
        return _insert_fused_grid_index(index, points, ids, valid)
    if isinstance(index, PackedGridIndex):
        return _insert_packed_grid_index(index, points, ids, valid)
    table_size = index.table_size
    c = index.max_per_cell
    cells = jnp.floor(points / index.cell_size).astype(jnp.int32)
    h = _hash_cells(cells, table_size).astype(jnp.int32)
    h = jnp.where(valid, h, table_size)
    order, dst = _slot_plan(h, table_size, c, base_counts=index.counts)

    pos_sorted = points[order]
    ids_sorted = ids[order]

    def upd(plane, vals):
        flat = plane.reshape(-1)
        flat = flat.at[dst].set(vals.astype(jnp.float32), mode="drop")
        return flat.reshape(table_size + 1, c)

    counts = index.counts.at[
        jnp.where(valid, h, table_size + 1)].add(1, mode="drop")
    return GridIndex(upd(index.px, pos_sorted[:, 0]),
                     upd(index.py, pos_sorted[:, 1]),
                     upd(index.pz, pos_sorted[:, 2]),
                     upd(index.pid, ids_sorted),
                     index.cell_size, counts)


# ------------------------------------------------------------------
# Packed-coordinate cell table (tpu.knn_packed_coords).
#
# The probe gathers above move 16 bytes per candidate slot (three f32
# coordinate planes + the f32 id plane); at mapping scale that is the
# single largest HBM stream of the optimization step (~180 MB/iter at
# 5000 rays x 36 probes x C=64). Since the renderer recomputes EXACT
# distances from the winners' true coordinates (renderer.py:167-171) and
# out-of-radius winners get interpolation weight exactly 0
# (decoders.interpolation_weights), the table coordinates only steer
# SELECTION — they can be aggressively quantized without injecting wrong
# values anywhere.
#
# Encoding: each coordinate is snapped to an infinite lattice of
# quantum g = cell_size / 64 and stored modulo 1024 (10 bits), so one
# cell spans 64 quanta and the wraparound period is 16 cells. x|y|z pack
# into ONE i32 plane (bits 0-9|10-19|20-29, sign bit 0; empty slots are
# -1). A probe gathers TWO rows (8 bytes/slot) instead of four (16):
# half the gather bytes AND half the gather rows of the f32 planes.
#
#   * precision: candidates round by <= g/2 per axis (~0.7 mm at an 8 cm
#     cell); selection among top-8 is unchanged except on sub-mm ties.
#     In-kernel d2 is EXACT integer arithmetic in quanta^2 (<= 3*512^2 <
#     2^24, exact in f32).
#   * wraparound: true in-box candidates lie within ~6 cells = 384 quanta
#     of the query, well inside the +-512-quanta unambiguous window. A
#     hash-COLLISION candidate from a cell >16 cells away can wrap-alias
#     into apparent proximity. Measured on a collision-heavy synthetic
#     (cloud span > wrap period, test_knn.py): an alias lands inside the
#     query radius on a few % of samples there; at production cell/radius
#     ratios the rate is ~0.5% of samples. The consequence is bounded: a
#     falsely selected far winner gets exact-distance weight 0 and exact
#     neighbor_count 0 in the renderer (which recomputes distances from
#     true coordinates), so the worst case is one DISPLACED candidate
#     slot — the same failure class as the bucket-overflow drops the
#     table already tolerates. Densify-dedup and sample_near_pcl consume
#     the returned (lattice) distances directly, so there an alias can
#     suppress one candidate point / mark one coarse sample near — both
#     are sampling heuristics with IVF-grade recall in the reference.
#   * counts-consuming callers (densify dedup, sample_near_pcl) receive
#     d2 * g^2 — exact lattice distances of rounded coordinates, i.e.
#     within ~1.7*g of the true distance; their radius thresholds are
#     cm-scale heuristics (the reference tolerates IVF nprobe=4 recall
#     there, src/neural_point.py:169-215).
# ------------------------------------------------------------------

_QBITS = 10
_QMASK = (1 << _QBITS) - 1            # 1023
_QPERIOD = float(1 << _QBITS)         # 1024.0
_Q_PER_CELL = 64.0                    # lattice quanta per grid cell


class PackedGridIndex(NamedTuple):
    """Cell-table index with 3x10-bit lattice-packed coordinates.

    Same bucket structure as GridIndex (one sentinel row at table_size);
    ``pxyz`` holds x|y<<10|z<<20 on the cell_size/64 lattice modulo 1024,
    with -1 marking empty slots; ``pid`` is the f32-valued id plane,
    +inf where empty (it doubles as the validity signal for the Pallas
    kernel's masked-sum id extraction, same as GridIndex).
    """
    pxyz: jnp.ndarray        # (TABLE+1, C) i32 packed lattice coords, -1 empty
    pid: jnp.ndarray         # (TABLE+1, C) f32 float-valued point id
    cell_size: jnp.ndarray   # () f32
    counts: jnp.ndarray      # (TABLE+1,) i32 TRUE per-bucket point count

    @property
    def table_size(self) -> int:
        return self.pxyz.shape[0] - 1

    @property
    def max_per_cell(self) -> int:
        return self.pxyz.shape[1]


class FusedGridIndex(NamedTuple):
    """PackedGridIndex with coords + ids in ONE (TABLE+1, 2C) i32 plane.

    Row layout per bucket: [:, :C] lattice-packed coords (as PackedGridIndex
    .pxyz, -1 empty), [:, C:] the f32-VALUED point id BITCAST to i32 (+inf
    bits where empty). One probe gather touches ONE 2C-wide row instead of
    two C-wide rows — halves the bucket-row count of the ray-kNN gather,
    which profiling/knn_prod_stages.py measures as row-count vs byte bound.
    Integer storage of the id bits is safe where f32 storage of BITCAST ids
    was not (the denormal-flush trap, see build_grid_index): no f32
    arithmetic ever touches the bit pattern until the kernel bitcasts it
    back. Gated by tpu.knn_packed_coords == 'fused'.
    """
    plane: jnp.ndarray       # (TABLE+1, 2C) i32
    cell_size: jnp.ndarray   # () f32
    counts: jnp.ndarray      # (TABLE+1,) i32 TRUE per-bucket point count

    @property
    def table_size(self) -> int:
        return self.plane.shape[0] - 1

    @property
    def max_per_cell(self) -> int:
        return self.plane.shape[1] // 2

    @property
    def pxyz(self) -> jnp.ndarray:
        return self.plane[:, :self.max_per_cell]

    @property
    def pid(self) -> jnp.ndarray:
        return jax.lax.bitcast_convert_type(
            self.plane[:, self.max_per_cell:], jnp.float32)


def _pack_lattice(points: jnp.ndarray, cell_size) -> jnp.ndarray:
    """(.., 3) f32 -> (..,) i32 packed 10-bit lattice coords (mod 1024)."""
    g = jnp.asarray(cell_size, jnp.float32) / _Q_PER_CELL
    q = jnp.floor(points / g + 0.5).astype(jnp.int32) & _QMASK
    return q[..., 0] | (q[..., 1] << _QBITS) | (q[..., 2] << (2 * _QBITS))


def _query_lattice(q: jnp.ndarray, cell_size) -> jnp.ndarray:
    """(.., 3) f32 -> continuous lattice coords reduced mod 1024."""
    g = jnp.asarray(cell_size, jnp.float32) / _Q_PER_CELL
    ql = q / g
    return ql - jnp.floor(ql / _QPERIOD) * _QPERIOD


def _unpack_lattice(v: jnp.ndarray):
    """i32 packed -> (x, y, z) f32 lattice coords; empty (-1) -> +inf."""
    inf = jnp.float32(jnp.inf)
    x = jnp.where(v < 0, inf, (v & _QMASK).astype(jnp.float32))
    y = jnp.where(v < 0, inf, ((v >> _QBITS) & _QMASK).astype(jnp.float32))
    z = jnp.where(v < 0, inf,
                  ((v >> (2 * _QBITS)) & _QMASK).astype(jnp.float32))
    return x, y, z


def _wrap_diff(df: jnp.ndarray) -> jnp.ndarray:
    """Shortest signed difference on the 1024-periodic lattice (f32)."""
    df = jnp.where(df > _QPERIOD / 2, df - _QPERIOD, df)
    return jnp.where(df < -_QPERIOD / 2, df + _QPERIOD, df)


@functools.partial(jax.jit, static_argnames=("table_size", "max_per_cell"))
def build_packed_grid_index(points: jnp.ndarray, n_points: jnp.ndarray,
                            cell_size: jnp.ndarray, table_size: int = 1 << 16,
                            max_per_cell: int = 96) -> PackedGridIndex:
    """build_grid_index with lattice-packed coordinate storage."""
    cap = points.shape[0]
    c = max_per_cell
    valid = jnp.arange(cap) < n_points
    cells = jnp.floor(points / cell_size).astype(jnp.int32)
    h = _hash_cells(cells, table_size).astype(jnp.int32)
    h = jnp.where(valid, h, table_size)
    order, dst = _slot_plan(h, table_size, c)

    flat_xyz = jnp.full(((table_size + 1) * c,), -1, jnp.int32)
    flat_xyz = flat_xyz.at[dst].set(_pack_lattice(points, cell_size)[order],
                                    mode="drop")
    flat_id = jnp.full(((table_size + 1) * c,), jnp.inf, jnp.float32)
    flat_id = flat_id.at[dst].set(order.astype(jnp.float32), mode="drop")
    counts = jnp.zeros((table_size + 1,), jnp.int32).at[
        jnp.where(valid, h, table_size + 1)].add(1, mode="drop")
    return PackedGridIndex(flat_xyz.reshape(table_size + 1, c),
                           flat_id.reshape(table_size + 1, c),
                           jnp.asarray(cell_size, jnp.float32), counts)


@jax.jit
def _insert_packed_grid_index(index: PackedGridIndex, points: jnp.ndarray,
                              ids: jnp.ndarray,
                              valid: jnp.ndarray) -> PackedGridIndex:
    """insert_grid_index for the packed layout (same append contract)."""
    table_size = index.table_size
    c = index.max_per_cell
    cells = jnp.floor(points / index.cell_size).astype(jnp.int32)
    h = _hash_cells(cells, table_size).astype(jnp.int32)
    h = jnp.where(valid, h, table_size)
    order, dst = _slot_plan(h, table_size, c, base_counts=index.counts)

    flat_xyz = index.pxyz.reshape(-1).at[dst].set(
        _pack_lattice(points, index.cell_size)[order], mode="drop")
    flat_id = index.pid.reshape(-1).at[dst].set(
        ids[order].astype(jnp.float32), mode="drop")
    counts = index.counts.at[
        jnp.where(valid, h, table_size + 1)].add(1, mode="drop")
    return PackedGridIndex(flat_xyz.reshape(table_size + 1, c),
                           flat_id.reshape(table_size + 1, c),
                           index.cell_size, counts)


def _fused_dst(dst: jnp.ndarray, c: int, table_size: int):
    """Map a _slot_plan flat slot (bucket*c + rank) into the fused plane's
    flat coordinates: coords at bucket*2c + rank, ids at +c. Parked slots
    ((table_size+1)*c) stay out of range for mode='drop'."""
    parked = dst >= (table_size + 1) * c
    coord = (dst // c) * (2 * c) + dst % c
    oob = (table_size + 1) * (2 * c)
    return jnp.where(parked, oob, coord), jnp.where(parked, oob, coord + c)


@functools.partial(jax.jit, static_argnames=("table_size", "max_per_cell"))
def build_fused_grid_index(points: jnp.ndarray, n_points: jnp.ndarray,
                           cell_size: jnp.ndarray, table_size: int = 1 << 16,
                           max_per_cell: int = 96) -> FusedGridIndex:
    """build_packed_grid_index with the one-plane fused layout."""
    cap = points.shape[0]
    c = max_per_cell
    valid = jnp.arange(cap) < n_points
    cells = jnp.floor(points / cell_size).astype(jnp.int32)
    h = _hash_cells(cells, table_size).astype(jnp.int32)
    h = jnp.where(valid, h, table_size)
    order, dst = _slot_plan(h, table_size, c)
    dst_c, dst_i = _fused_dst(dst, c, table_size)

    empty = jnp.tile(jnp.concatenate(
        [jnp.full((c,), -1, jnp.int32),
         jnp.full((c,), 0x7F800000, jnp.int32)]), table_size + 1)
    flat = empty.at[dst_c].set(_pack_lattice(points, cell_size)[order],
                               mode="drop")
    flat = flat.at[dst_i].set(jax.lax.bitcast_convert_type(
        order.astype(jnp.float32), jnp.int32), mode="drop")
    counts = jnp.zeros((table_size + 1,), jnp.int32).at[
        jnp.where(valid, h, table_size + 1)].add(1, mode="drop")
    return FusedGridIndex(flat.reshape(table_size + 1, 2 * c),
                          jnp.asarray(cell_size, jnp.float32), counts)


@jax.jit
def _insert_fused_grid_index(index: FusedGridIndex, points: jnp.ndarray,
                             ids: jnp.ndarray,
                             valid: jnp.ndarray) -> FusedGridIndex:
    """insert_grid_index for the fused layout (same append contract)."""
    table_size = index.table_size
    c = index.max_per_cell
    cells = jnp.floor(points / index.cell_size).astype(jnp.int32)
    h = _hash_cells(cells, table_size).astype(jnp.int32)
    h = jnp.where(valid, h, table_size)
    order, dst = _slot_plan(h, table_size, c, base_counts=index.counts)
    dst_c, dst_i = _fused_dst(dst, c, table_size)

    flat = index.plane.reshape(-1).at[dst_c].set(
        _pack_lattice(points, index.cell_size)[order], mode="drop")
    flat = flat.at[dst_i].set(jax.lax.bitcast_convert_type(
        ids[order].astype(jnp.float32), jnp.int32), mode="drop")
    counts = index.counts.at[
        jnp.where(valid, h, table_size + 1)].add(1, mode="drop")
    return FusedGridIndex(flat.reshape(table_size + 1, 2 * c),
                          index.cell_size, counts)


# The 27 neighbor-cell offsets, static.
_OFFSETS = jnp.array(
    [[dx, dy, dz] for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
    dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("k",))
def grid_knn(index: GridIndex, queries: jnp.ndarray, k: int = 8):
    """Top-k in-ball neighbors for each query.

    Args:
        index: GridIndex built by build_grid_index.
        queries: (Q, 3).

    Returns:
        dists: (Q, k) squared L2, +inf where no candidate.
        idx:   (Q, k) point indices (0 where invalid).
        valid: (Q, k) bool.
    """
    q = queries.astype(jnp.float32)
    nq = q.shape[0]
    table_size = index.table_size
    c = index.max_per_cell
    qcells = jnp.floor(q / index.cell_size).astype(jnp.int32)  # (Q,3)

    # Bucket ids of the 27 neighbor cells: (Q, 27)
    probe_cells = qcells[:, None, :] + _OFFSETS[None, :, :]
    hs = _hash_cells(probe_cells, table_size).astype(jnp.int32)

    # Dedup buckets that collide among this query's 27 probes (would otherwise
    # surface the same candidates twice and corrupt top-k / radius counts).
    dup = (hs[:, :, None] == hs[:, None, :]) & (
        jnp.arange(27)[None, :, None] > jnp.arange(27)[None, None, :])
    probe_ok = ~jnp.any(dup, axis=-1)  # (Q, 27)

    if isinstance(index, (PackedGridIndex, FusedGridIndex)):
        x, y, z = _unpack_lattice(index.pxyz[hs])            # (Q,27,C)
        qm = _query_lattice(q, index.cell_size)              # (Q,3)
        dx = _wrap_diff(x - qm[:, None, None, 0])
        dy = _wrap_diff(y - qm[:, None, None, 1])
        dz = _wrap_diff(z - qm[:, None, None, 2])
        g = index.cell_size / _Q_PER_CELL
        # lattice d2 is exact in quanta^2; scale to metric units for the
        # callers' radius thresholds (coordinates rounded by <= g/2/axis)
        d2 = (dx * dx + dy * dy + dz * dz) * (g * g)
    else:
        dx = index.px[hs] - q[:, None, None, 0]              # (Q,27,C)
        dy = index.py[hs] - q[:, None, None, 1]
        dz = index.pz[hs] - q[:, None, None, 2]
        # stack + sum mirrors the packed-table version's reduction exactly
        # (bit-parity with the pre-plane-split implementation; XLA fuses
        # the stack away)
        diff = jnp.stack([dx, dy, dz], axis=-1)
        d2 = jnp.sum(diff * diff, axis=-1)                   # (Q,27,C)
    d2 = jnp.where(probe_ok[:, :, None], d2, jnp.inf).reshape(nq, 27 * c)

    neg_top, pos = jax.lax.top_k(-d2, k)
    dists = -neg_top
    # Reconstruct the point id of each winner with a tiny (Q,k) gather from
    # the flat id plane instead of materializing + take_along_axis over the
    # full (Q, 27*C) int32 candidate-id tensor (saves two 27*C-wide HBM
    # passes — the id plane is never gathered at query width at all).
    win_h = jnp.take_along_axis(hs, pos // c, axis=1)        # (Q,k)
    flat_ids = index.pid.reshape(-1)
    win_ids = flat_ids[win_h * c + (pos % c)]                # float-valued ids
    valid = jnp.isfinite(dists)
    idx = jnp.where(valid, win_ids, 0.0).astype(jnp.int32)
    return dists, idx, valid


# ------------------------------------------------------------------
# Ray-shared kNN: one probe set per ray, Pallas-fused top-k.
#
# The renderer queries kNN at R rays x ns samples whose samples span only
# ~0.04*depth along the ray (Renderer.py:134-147 z-placement), so adjacent
# samples probe nearly identical cell neighborhoods. Instead of 27 probed
# cells per SAMPLE (grid_knn: 27*ns rows gathered per ray), probe the 4x4x4
# cell box around the ray's sample bbox (+1-cell margin) ONCE per ray:
# ~2.1x fewer gathered rows at mapping scale. The d2 + top-k stage over the
# shared (P*C)-candidate set would blow up XLA (materialized (R, ns, 64*C)
# intermediates); a Pallas kernel does it in VMEM:
#
#   * per sample: d2 against the ray's candidates, then top-k by iterative
#     min-extraction over PACKED int32 keys (quantized-d2 high bits | lane
#     index low bits) — min-reduce yields value and argmin in one pass.
#     Quantization only affects selection among near-ties; callers recompute
#     exact distances from the winners' coordinates.
#   * winner point-ids are extracted in-kernel by masked sum (element-wise
#     take_along_axis epilogues in XLA cost more than the whole kernel).
#
# Rays whose samples span >2 cells on an axis (uniform sampling of
# depth-free rays) don't fit the box; they're flagged `compact=False` and
# the caller routes them through per-sample grid_knn.
# Measured (profiling/knn_pallas2/3/5.py, 5000 rays x 5 samples, 300k
# points): 4.9 ms at the default 36-slot probe budget vs 16.1 ms for
# per-sample grid_knn, top-8 dist-set parity 99.95% (identical result
# sets to the full 64-cell box on this workload).
# ------------------------------------------------------------------

_BOX = 4   # probed cells per axis
# Compacted probe-slot budget per ray. 48 covers every extent pattern except
# (4,4,4), which drops its 16 outermost corner cells (center-out ordering
# below). Depth-guided sample spans put ~50% of rays at 27 needed slots and
# ~98% at <=36 (measured), so 36 is a faster near-lossless default. The
# budget is a compiled kernel shape, so it flows as a STATIC argument from
# config (tpu.knn_probes -> RenderConfig.knn_probes); the env var remains
# only as a deprecated default override for older scripts.
_P_RAY_DEFAULT = int(os.environ.get("POINT_SLAM_KNN_PROBES", "36"))
if not 1 <= _P_RAY_DEFAULT <= _BOX ** 3:
    import warnings
    warnings.warn(
        f"POINT_SLAM_KNN_PROBES={_P_RAY_DEFAULT} out of range "
        f"[1, {_BOX ** 3}]; clamping", stacklevel=1)
    _P_RAY_DEFAULT = min(max(_P_RAY_DEFAULT, 1), _BOX ** 3)
_OFF_BOX = jnp.array(
    [[x, y, z] for x in range(_BOX) for y in range(_BOX) for z in range(_BOX)],
    dtype=jnp.int32)                                         # (64, 3)
_RAY_BLK = 32


@functools.lru_cache(maxsize=None)
def _build_probe_perms(p_ray: int):
    """Static per-pattern compaction tables for a given probe budget.

    The validity pattern of the 64 box offsets depends only on the per-axis
    extents in {3, 4} — 8 patterns. For each, a permutation puts the valid
    offsets first (ordered center-out so truncation drops corner cells);
    slots past the pattern's valid count are masked to the sentinel. This
    turns probe compaction into 8 static reindexings + one flat row gather
    (sort/scatter-based compaction costs more than the rows it saves).
    """
    import numpy as _np
    off = _np.array([[x, y, z] for x in range(_BOX) for y in range(_BOX)
                     for z in range(_BOX)], _np.int64)
    perms = _np.zeros((8, p_ray), _np.int32)
    n_valid = _np.zeros(8, _np.int32)
    for pat in range(8):
        ex, ey, ez = (pat >> 2 & 1) + 3, (pat >> 1 & 1) + 3, (pat & 1) + 3
        ok = (off[:, 0] < ex) & (off[:, 1] < ey) & (off[:, 2] < ez)
        center = (_np.array([ex, ey, ez]) - 1) / 2.0
        d = _np.abs(off - center).max(1) + 1e-3 * _np.abs(off - center).sum(1)
        order = _np.lexsort((_np.arange(off.shape[0]), d, ~ok))
        perms[pat] = order[:p_ray]
        n_valid[pat] = min(int(ok.sum()), p_ray)
    slot_ok = _np.arange(p_ray)[None, :] < n_valid[:, None]
    # return NUMPY (not jnp): the cache is shared across jit traces, and a
    # device array materialized inside one trace is a leaked tracer in the
    # next
    return perms, slot_ok


def _box_probes(q: jnp.ndarray, cell_size, table_size: int, p_ray: int):
    """Per-ray probe buckets over the sample bbox +1 margin.

    q: (R, ns, 3). Returns (probes (R, p_ray) int32 with
    sentinel=table_size for out-of-extent/duplicate buckets,
    compact (R,) bool).
    """
    perms, slot_ok = _build_probe_perms(p_ray)
    r = q.shape[0]
    qc = jnp.floor(q / cell_size).astype(jnp.int32)          # (R,ns,3)
    cmin = jnp.min(qc, axis=1) - 1
    cmax = jnp.max(qc, axis=1) + 1
    # if the box exceeds _BOX cells, drop the near margin first (sample
    # cells stay covered up to span _BOX-2); flag the ray non-compact
    start = jnp.where(cmax - cmin + 1 > _BOX, cmin + 1, cmin)
    compact = jnp.all(cmax - cmin + 1 <= _BOX, axis=-1)
    ext = jnp.clip(cmax - start + 1, 3, 4)
    pattern = (ext[:, 0] - 3) * 4 + (ext[:, 1] - 3) * 2 + (ext[:, 2] - 3)
    cells = start[:, None, :] + _OFF_BOX[None]               # (R,64,3)
    h = _hash_cells(cells, table_size).astype(jnp.int32)
    stack = jnp.stack([jnp.where(slot_ok[p],
                                 h[:, perms[p]], table_size)
                       for p in range(8)])                   # (8,R,p_ray)
    flat = stack.reshape(8 * r, p_ray)
    hp = flat[pattern * r + jnp.arange(r, dtype=jnp.int32)]
    dup = (hp[:, :, None] == hp[:, None, :]) & (
        jnp.arange(p_ray)[None, :, None]
        > jnp.arange(p_ray)[None, None, :])
    return jnp.where(jnp.any(dup, axis=-1), table_size, hp), compact


def _ray_topk_kernel(ns: int, k: int, pc: int, lane_mask: int):
    """Min-extraction over packed (quantized-d2 | lane) keys. Winner point
    ids ARE extracted in-kernel by a masked sum over the gathered id-plane
    block: the winner's lane mask selects exactly one lane, so
    sum(where(sel, id, 0)) is the id — one VPU reduce per winner, all in
    VMEM. The alternatives are far worse on TPU: an XLA take_along_axis
    epilogue or a flat (R*ns*k) gather from the id plane both lower to
    per-ELEMENT row DMA (~5.7 ms/iter at mapping scale, measured in
    profiling/geo_fwd_split.py — the id reconstruction cost only shows up
    when idx is actually consumed; d-only micros let XLA dead-code it)."""
    def kernel(x_ref, y_ref, z_ref, ci_ref, qx_ref, qy_ref, qz_ref,
               out_p_ref, out_i_ref):
        X = x_ref[...]
        Y = y_ref[...]
        Z = z_ref[...]
        CI = ci_ref[...]
        lane = jax.lax.broadcasted_iota(jnp.int32, X.shape, 1)
        for s in range(ns):
            dx = X - qx_ref[:, s][:, None]
            dy = Y - qy_ref[:, s][:, None]
            dz = Z - qz_ref[:, s][:, None]
            d2 = dx * dx + dy * dy + dz * dz
            packed = ((jax.lax.bitcast_convert_type(d2, jnp.int32)
                       & ~jnp.int32(lane_mask)) | lane)
            for kk in range(k):
                m = jnp.min(packed, axis=-1, keepdims=True)  # (BLK, 1)
                sel = lane == (m & lane_mask)
                out_p_ref[:, s * k + kk] = m[:, 0]
                out_i_ref[:, s * k + kk] = jnp.sum(
                    jnp.where(sel, CI, 0.0), axis=-1)
                packed = jnp.where(sel, jnp.int32(0x7FFFFFFF), packed)
    return kernel


def _ray_topk_kernel_packed(ns: int, k: int, pc: int, lane_mask: int):
    """_ray_topk_kernel over ONE packed-lattice candidate plane.

    Identical min-extraction structure; the candidate block is a single
    i32 plane unpacked in VMEM (3 shifts/ands + casts, VPU-cheap) and
    distances are wrap-corrected lattice d2 — exact integer arithmetic in
    quanta^2 (<= 3*512^2 < 2^24). Empty slots (-1) unpack to +inf and fall
    out through the same quantized-+inf validity threshold as the f32
    kernel. Queries arrive as continuous lattice coordinates mod 1024."""
    def kernel(v_ref, ci_ref, qx_ref, qy_ref, qz_ref, out_p_ref, out_i_ref):
        X, Y, Z = _unpack_lattice(v_ref[...])
        CI = ci_ref[...]
        lane = jax.lax.broadcasted_iota(jnp.int32, X.shape, 1)
        for s in range(ns):
            dx = _wrap_diff(X - qx_ref[:, s][:, None])
            dy = _wrap_diff(Y - qy_ref[:, s][:, None])
            dz = _wrap_diff(Z - qz_ref[:, s][:, None])
            d2 = dx * dx + dy * dy + dz * dz
            packed = ((jax.lax.bitcast_convert_type(d2, jnp.int32)
                       & ~jnp.int32(lane_mask)) | lane)
            for kk in range(k):
                m = jnp.min(packed, axis=-1, keepdims=True)  # (BLK, 1)
                sel = lane == (m & lane_mask)
                out_p_ref[:, s * k + kk] = m[:, 0]
                out_i_ref[:, s * k + kk] = jnp.sum(
                    jnp.where(sel, CI, 0.0), axis=-1)
                packed = jnp.where(sel, jnp.int32(0x7FFFFFFF), packed)
    return kernel


def _ray_topk_kernel_fused(ns: int, k: int, pc2: int, lane_mask: int, c: int):
    """_ray_topk_kernel_packed over the fused (coords|ids) candidate block.

    The block interleaves per-probe [C coord lanes | C id-bit lanes]; id
    lanes get +inf d2 so they never win selection, and a winner at coord
    lane l reads its id bits (f32-valued id, bitcast) from lane l + C of
    the same probe row — no second gathered plane at all. One extra lane
    bit of d2 quantization vs the two-plane kernel (selection-only; exact
    distances are recomputed from winner coordinates by the caller)."""
    def kernel(v_ref, qx_ref, qy_ref, qz_ref, out_p_ref, out_i_ref):
        V = v_ref[...]
        lane = jax.lax.broadcasted_iota(jnp.int32, V.shape, 1)
        is_coord = (lane % (2 * c)) < c
        X, Y, Z = _unpack_lattice(V)
        CI = jax.lax.bitcast_convert_type(V, jnp.float32)
        inf = jnp.float32(jnp.inf)
        for s in range(ns):
            dx = _wrap_diff(X - qx_ref[:, s][:, None])
            dy = _wrap_diff(Y - qy_ref[:, s][:, None])
            dz = _wrap_diff(Z - qz_ref[:, s][:, None])
            d2 = jnp.where(is_coord, dx * dx + dy * dy + dz * dz, inf)
            packed = ((jax.lax.bitcast_convert_type(d2, jnp.int32)
                       & ~jnp.int32(lane_mask)) | lane)
            for kk in range(k):
                m = jnp.min(packed, axis=-1, keepdims=True)  # (BLK, 1)
                win = m & lane_mask
                out_p_ref[:, s * k + kk] = m[:, 0]
                out_i_ref[:, s * k + kk] = jnp.sum(
                    jnp.where(lane == win + c, CI, 0.0), axis=-1)
                packed = jnp.where(lane == win, jnp.int32(0x7FFFFFFF),
                                   packed)
    return kernel


@functools.partial(jax.jit, static_argnames=("k", "probes"))
def ray_grid_knn(index: GridIndex, q_rays: jnp.ndarray, k: int = 8,
                 probes: int = 0):
    """Top-k in-ball neighbors for ray-structured queries.

    Args:
        index: GridIndex built by build_grid_index.
        q_rays: (R, ns, 3) sample positions, samples of one ray spatially
            close (depth-guided z-vals).
        probes: per-ray probe-slot budget (compiled kernel shape); 0 uses
            the module default (tpu.knn_probes flows here via RenderConfig).

    Returns:
        dists: (R*ns, k) squared L2 — QUANTIZED to ~11 mantissa bits (used
            for selection only; recompute exactly from winner coordinates).
        idx:   (R*ns, k) point indices (0 where invalid).
        valid: (R*ns, k) bool.
        compact: (R,) bool — False where the ray's samples exceeded the
            probed box and results may miss neighbors (route through
            grid_knn instead).
    """
    p_ray = probes or _P_RAY_DEFAULT
    p_ray = min(max(p_ray, 1), _BOX ** 3)
    r, ns, _ = q_rays.shape
    q = q_rays.astype(jnp.float32)
    table_size = index.table_size
    c = index.max_per_cell
    pc = p_ray * c
    lane_mask = (1 << (pc - 1).bit_length()) - 1

    pad = (-r) % _RAY_BLK
    if pad:
        q = jnp.concatenate([q, jnp.zeros((pad, ns, 3), jnp.float32)])
    rp = r + pad

    probe_rows, compact = _box_probes(q, index.cell_size, table_size, p_ray)
    bs_c = pl.BlockSpec((_RAY_BLK, pc), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    bs_q = pl.BlockSpec((_RAY_BLK, ns), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    bs_o = pl.BlockSpec((_RAY_BLK, ns * k), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((rp, ns * k), jnp.int32),
                 jax.ShapeDtypeStruct((rp, ns * k), jnp.float32)]
    interpret = jax.default_backend() == "cpu"
    if isinstance(index, FusedGridIndex):
        # ONE fused (coords|ids) row per probe: HALF the bucket-row count
        # of the two-plane packed gather (row-DMA-rate bound, see
        # profiling/knn_prod_stages.py). Same selection semantics up to one
        # extra quantization lane bit.
        pc2 = p_ray * 2 * c
        lane_mask = (1 << (pc2 - 1).bit_length()) - 1
        cv = index.plane[probe_rows].reshape(rp, pc2)        # (R, P*2C) i32
        qm = _query_lattice(q, index.cell_size)              # (R, ns, 3)
        bs_c2 = pl.BlockSpec((_RAY_BLK, pc2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        packed, ids = pl.pallas_call(
            _ray_topk_kernel_fused(ns, k, pc2, lane_mask, c),
            grid=(rp // _RAY_BLK,),
            in_specs=[bs_c2, bs_q, bs_q, bs_q],
            out_specs=[bs_o, bs_o],
            out_shape=out_shape,
            interpret=interpret,
        )(cv, qm[..., 0], qm[..., 1], qm[..., 2])
        g = index.cell_size / _Q_PER_CELL
        d2_scale = g * g                                     # quanta^2 -> m^2
    elif isinstance(index, PackedGridIndex):
        # ONE packed-coordinate row + the id row per probe: 8 bytes/slot
        # gathered instead of 16, half the gather rows. Queries go in as
        # continuous lattice coordinates (mod 1024).
        cv = index.pxyz[probe_rows].reshape(rp, pc)          # (R, P*C) i32
        ci = index.pid[probe_rows].reshape(rp, pc)
        qm = _query_lattice(q, index.cell_size)              # (R, ns, 3)
        packed, ids = pl.pallas_call(
            _ray_topk_kernel_packed(ns, k, pc, lane_mask),
            grid=(rp // _RAY_BLK,),
            in_specs=[bs_c, bs_c, bs_q, bs_q, bs_q],
            out_specs=[bs_o, bs_o],
            out_shape=out_shape,
            interpret=interpret,
        )(cv, ci, qm[..., 0], qm[..., 1], qm[..., 2])
        g = index.cell_size / _Q_PER_CELL
        d2_scale = g * g                                     # quanta^2 -> m^2
    else:
        # Component-plane gathers feed the kernel its layout directly — no
        # transpose/copy stage. The id plane is gathered at probe width
        # like the coordinate planes; winner ids come out of the kernel
        # (see _ray_topk_kernel for why an XLA id-reconstruction epilogue
        # loses).
        cx = index.px[probe_rows].reshape(rp, pc)            # (R, P*C)
        cy = index.py[probe_rows].reshape(rp, pc)
        cz = index.pz[probe_rows].reshape(rp, pc)
        ci = index.pid[probe_rows].reshape(rp, pc)
        packed, ids = pl.pallas_call(
            _ray_topk_kernel(ns, k, pc, lane_mask),
            grid=(rp // _RAY_BLK,),
            in_specs=[bs_c, bs_c, bs_c, bs_c, bs_q, bs_q, bs_q],
            out_specs=[bs_o, bs_o],
            out_shape=out_shape,
            interpret=interpret,
        )(cx, cy, cz, ci, q[..., 0], q[..., 1], q[..., 2])
        d2_scale = jnp.float32(1.0)

    valid = packed < jnp.int32(0x7F800000)                   # quantized +inf
    idx = jnp.where(valid, ids, 0.0).astype(jnp.int32)
    d2q = jax.lax.bitcast_convert_type(packed & ~jnp.int32(lane_mask),
                                       jnp.float32) * d2_scale
    d2q = jnp.where(valid, d2q, jnp.inf)
    out = (d2q.reshape(rp * ns, k)[:r * ns],
           idx.reshape(rp * ns, k)[:r * ns],
           valid.reshape(rp * ns, k)[:r * ns],
           compact[:r])
    return jax.tree.map(jax.lax.stop_gradient, out)


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def grid_knn_subset(index: GridIndex, q_rays: jnp.ndarray, need: jnp.ndarray,
                    k: int = 8, chunk: int = 512):
    """Per-sample grid_knn over only the rays where ``need`` is True.

    The renderer's non-compact fallback: grid_knn's TPU cost is set by its
    static query count (27 x max_per_cell gathered rows per query), so running
    it over the full (R*ns) batch with parked queries costs ~5 ms/iter even
    when only a handful of rays need it. Instead, compact the needed ray ids
    (``nonzero(size=R)``) and sweep them in fixed ``chunk``-ray slices inside
    a ``lax.while_loop`` — the device cost is one small grid_knn launch per
    ceil(n_needed/chunk), i.e. proportional to the actual fallback workload.

    Args:
        q_rays: (R, ns, 3) sample positions (ray-major, as ray_grid_knn).
        need:   (R,) bool — rays to search; others are skipped.

    Returns:
        idx:   (R, ns, k) int32 — zeros on rays where need=False.
        valid: (R, ns, k) bool  — False on rays where need=False.

    Values on needed rays are bit-identical to ``grid_knn`` on the same
    queries (it IS grid_knn, on a gathered subset).
    """
    r, ns, _ = q_rays.shape
    ch = min(chunk, r)
    need_idx = jnp.nonzero(need, size=r, fill_value=r)[0].astype(jnp.int32)
    # pad so dynamic_slice never clamps (starts sweep 0..<n_need <= r)
    need_pad = jnp.concatenate([need_idx, jnp.full((ch,), r, jnp.int32)])
    # row r is the parked row: +inf-distance queries, results discarded
    pts_pad = jnp.concatenate(
        [q_rays.astype(jnp.float32), jnp.full((1, ns, 3), 1.0e6, jnp.float32)])
    n_need = jnp.sum(need).astype(jnp.int32)

    idx0 = jnp.zeros((r + 1, ns, k), jnp.int32)
    val0 = jnp.zeros((r + 1, ns, k), bool)

    def cond(st):
        return st[0] < n_need

    def body(st):
        start, ip, vp = st
        sel = jax.lax.dynamic_slice(need_pad, (start,), (ch,))   # (ch,)
        qp = pts_pad[sel].reshape(ch * ns, 3)
        _, i_f, v_f = grid_knn(index, qp, k=k)
        # duplicate sel entries are all the parked row r writing identical
        # zero rows — scatter order cannot matter
        ip = ip.at[sel].set(i_f.reshape(ch, ns, k))
        vp = vp.at[sel].set(v_f.reshape(ch, ns, k))
        return (start + ch, ip, vp)

    _, ip, vp = jax.lax.while_loop(cond, body, (jnp.int32(0), idx0, val0))
    return ip[:r], vp[:r]


@functools.partial(jax.jit, static_argnames=("k", "tile"))
def brute_knn(points: jnp.ndarray, n_points: jnp.ndarray, queries: jnp.ndarray,
              k: int = 8, tile: int = 4096):
    """Exact top-k by squared L2 over the first n_points rows. Test oracle.

    Tiled scan with a running top-k merge; distances recomputed exactly from
    coordinates for the selected candidates.
    """
    cap = points.shape[0]
    q = queries.astype(jnp.float32)
    nq = q.shape[0]
    pad = (-cap) % tile
    pts = jnp.pad(points.astype(jnp.float32), ((0, pad), (0, 0)))
    n_tiles = pts.shape[0] // tile
    pt_tiles = pts.reshape(n_tiles, tile, 3)

    init_d = jnp.full((nq, k), jnp.inf, jnp.float32)
    init_i = jnp.zeros((nq, k), jnp.int32)

    def body(carry, inp):
        best_d, best_i = carry
        tile_pts, tile_off = inp
        diff = q[:, None, :] - tile_pts[None, :, :]
        d2 = jnp.sum(diff * diff, axis=-1)                  # (Q, tile)
        gidx = tile_off + jnp.arange(tile, dtype=jnp.int32)
        ok = gidx < n_points
        d2 = jnp.where(ok[None, :], d2, jnp.inf)
        merged_d = jnp.concatenate([best_d, d2], axis=1)
        merged_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(gidx[None, :], (nq, tile))], axis=1)
        neg_top, pos = jax.lax.top_k(-merged_d, k)
        return (-neg_top, jnp.take_along_axis(merged_i, pos, axis=1)), None

    offs = (jnp.arange(n_tiles, dtype=jnp.int32) * tile)
    (best_d, best_i), _ = jax.lax.scan(body, (init_d, init_i), (pt_tiles, offs))
    valid = jnp.isfinite(best_d)
    return best_d, jnp.where(valid, best_i, 0), valid


def neighbor_count(dists: jnp.ndarray, valid: jnp.ndarray,
                   radius: jnp.ndarray) -> jnp.ndarray:
    """Number of returned neighbors within (per-query or scalar) radius.

    Parity: src/neural_point.py:207-213 (D compared against radius**2 over the
    k returned columns).
    """
    r2 = jnp.asarray(radius, jnp.float32)
    if r2.ndim >= 1:
        r2 = r2.reshape(-1, 1)
    return jnp.sum((dists < r2 * r2) & valid, axis=-1).astype(jnp.int32)
