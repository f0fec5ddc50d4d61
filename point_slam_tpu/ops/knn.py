"""k-nearest-neighbor search over the padded neural point buffer.

This is the TPU-native replacement for the reference's FAISS GPU IVFFlat
index (src/neural_point.py:37-41,169-215 — top-8 squared L2 + per-query
radius counts). Two strategies:

* ``grid``  — voxel grid-hash stored as a *dense cell table*: a
  (TABLE, C, 4) f32 array where row [h] holds up to C packed candidates
  (xyz + bitcast int32 point id) of every point whose cell hashes to bucket
  h; empty slots carry +inf positions so their distances are +inf without
  any masking. Queries gather the 27-neighbor-cell blocks — one *wide-row*
  gather (27 rows of C*16 bytes per query) instead of per-point 12-byte rows,
  which is the difference between ~1 GB/s and near-bandwidth gather
  throughput on TPU — and select top-k by exact squared distance. Since only
  in-radius neighbors ever receive interpolation weight (decoder.py:157) and
  the dedup/count tests are radius-bounded, radius-limited candidates are
  semantically sufficient — and this search has *better* recall than the
  reference's IVF nprobe=4/400.
* ``brute`` — exact tiled scan with a running top-k merge; used as the test
  oracle and for small clouds.

Returned distances are exact squared L2 (computed from gathered candidate
coordinates, no matmul cancellation error). Invalid slots get D=+inf, I=0.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

# Large-prime spatial hash (Teschner et al.), int32 wraparound is fine.
_P1, _P2, _P3 = 73856093, 19349669, 83492791


def _hash_cells(cells: jnp.ndarray, table_size: int) -> jnp.ndarray:
    """(.., 3) int32 cell coords -> bucket id in [0, table_size)."""
    h = (cells[..., 0] * _P1) ^ (cells[..., 1] * _P2) ^ (cells[..., 2] * _P3)
    return jax.lax.bitcast_convert_type(h, jnp.uint32).astype(jnp.uint32) % jnp.uint32(table_size)


class GridIndex(NamedTuple):
    """Dense cell-table point index. Shapes are static in (table_size, C)."""
    table: jnp.ndarray       # (TABLE, C, 4) f32: xyz + bitcast int32 id;
                             # empty slots have +inf position
    cell_size: jnp.ndarray   # () f32

    @property
    def table_size(self) -> int:
        return self.table.shape[0]

    @property
    def max_per_cell(self) -> int:
        return self.table.shape[1]


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
    order = jnp.argsort(h, stable=True).astype(jnp.int32)
    hs = h[order]

    # slot within the bucket = position inside the sorted run
    ar = jnp.arange(cap, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool), hs[1:] != hs[:-1]])
    run_start = jax.lax.associative_scan(jnp.maximum,
                                         jnp.where(is_start, ar, 0))
    rank = ar - run_start
    dst = hs * c + rank
    dst = jnp.where((rank < c) & (hs < table_size), dst, table_size * c)

    pos_sorted = points[order]
    # ids ride as float-VALUED integers (exact for ids < 2^24; capacity is
    # capped at 2^22). Bitcasting int32 bits into f32 is NOT safe here: small
    # ids are denormals and XLA flushes denormals to zero in ops like
    # concatenate.
    packed = jnp.concatenate(
        [pos_sorted.astype(jnp.float32),
         order.astype(jnp.float32)[:, None]], axis=-1)
    flat = jnp.full((table_size * c, 4), jnp.inf, jnp.float32)
    flat = flat.at[dst].set(packed, mode="drop")
    return GridIndex(flat.reshape(table_size, c, 4),
                     jnp.asarray(cell_size, jnp.float32))


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

    blocks = index.table[hs]                                 # (Q,27,C,4)
    cand_pos = blocks[..., :3]

    diff = cand_pos - q[:, None, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)                       # (Q,27,C)
    d2 = jnp.where(probe_ok[:, :, None], d2, jnp.inf).reshape(nq, 27 * c)

    neg_top, pos = jax.lax.top_k(-d2, k)
    dists = -neg_top
    # Reconstruct the point id of each winner with a tiny (Q,k) gather from
    # the flat table instead of materializing + take_along_axis over the full
    # (Q, 27*C) int32 candidate-id tensor (saves two 27*C-wide HBM passes).
    win_h = jnp.take_along_axis(hs, pos // c, axis=1)        # (Q,k)
    flat_ids = index.table.reshape(table_size * c, 4)[:, 3]
    win_ids = flat_ids[win_h * c + (pos % c)]                # float-valued ids
    valid = jnp.isfinite(dists)
    idx = jnp.where(valid, win_ids, 0.0).astype(jnp.int32)
    return dists, idx, valid


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
