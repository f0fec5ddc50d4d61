"""Dynamic neural point cloud as padded static-shape device buffers.

TPU-native redesign of the reference NeuralPointCloud (src/neural_point.py):
instead of python lists + a FAISS index living in a manager process, the cloud
is a pytree of pre-allocated HBM arrays with a live count; insertion is a
masked compact-scatter (one jit), and neighbor search goes through the
grid-hash index (ops/knn.py) rebuilt as a jit after each insertion.

Storage layout: geometry features, color features, and positions live in ONE
packed (CAP, 72) array — [geo 0:32 | col 32:64 | pos 64:67 | pad 67:72].
TPU row-gathers are row-count bound, not byte bound (a 64-wide f32 row gather
is ~2x faster than two 32-wide ones, measured), so the renderer fetches all
per-neighbor state with a single gather, the backward pass is a single
scatter-add, and the mapper's Adam runs over one leaf with per-column
learning rates. The reference keeps three separate tensors
(src/neural_point.py:29-34); the semantics are identical.

Semantics preserved:
* points added only at locations with no existing neighbor within the
  (per-ray dynamic) add radius (src/neural_point.py:118-121)
* N_add points per accepted location along the ray in
  [near_end_surface*d, far_end_surface*d] (or a fixed +-4cm interval)
  (src/neural_point.py:126-147)
* new features ~ N(0, 0.1) (src/neural_point.py:150-159)
* input_pos/input_rgb record the accepted surface locations (rgb*255)
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from point_slam_tpu.ops import knn

# packed-column layout (f32): c_dim geo | c_dim col | 3 pos | pad to PACK_W
C_DIM = 32
GEO_SL = slice(0, C_DIM)
COL_SL = slice(C_DIM, 2 * C_DIM)
POS_SL = slice(2 * C_DIM, 2 * C_DIM + 3)
PACK_W = 72


class CloudState(NamedTuple):
    packed: jnp.ndarray     # (CAP, PACK_W): geo feats | col feats | pos | pad
    n_points: jnp.ndarray   # () int32
    input_pos: jnp.ndarray  # (CAP // N_add, 3) accepted surface locations
    input_rgb: jnp.ndarray  # (CAP // N_add, 3) rgb * 255
    n_inputs: jnp.ndarray   # () int32

    @property
    def pos(self) -> jnp.ndarray:
        return self.packed[:, POS_SL]

    @property
    def geo_feats(self) -> jnp.ndarray:
        return self.packed[:, GEO_SL]

    @property
    def col_feats(self) -> jnp.ndarray:
        return self.packed[:, COL_SL]


# ------------------------------------------------ bf16 render view (tpu.bf16_features)
#
# The per-iteration HBM traffic over the packed buffer (neighbor row gather,
# backward scatter-add, gradient sweeps) is bandwidth-bound at mapping scale.
# ``encode_render`` produces a HALF-WIDTH (CAP, 72) bf16 view of the f32
# master for the render path: feature columns cast to bf16 (gradients flow,
# so the backward scatter-add also runs at bf16 width), positions stored as
# a hi+lo bf16 pair per component (~1.5e-5 relative error — 0.1 mm at room
# scale — vs 2e-3 for naked bf16, which would corrupt kNN-radius tests).
# Adam and its moments stay f32 on the master buffer; CPU runs keep the
# all-f32 path (flag resolves off-CPU only) so the determinism golden is
# unchanged.
#
# The hi half is derived by BIT TRUNCATION (shift/mask), not
# ``astype(bfloat16)``: XLA's algebraic simplifier folds the convert chain
# ``bf16(pos - f32(bf16(pos)))`` into ``bf16(pos) - bf16(pos) = 0``,
# silently zeroing the lo lane (measured: lo == 0 under jit with the
# arithmetic formulation). Bit ops block the folding, and truncation keeps
# f32(hi) exactly representable so lo = pos - f32(hi) is exact before its
# own bf16 rounding.
POS_HI_SL = slice(2 * C_DIM, 2 * C_DIM + 3)
POS_LO_SL = slice(2 * C_DIM + 3, 2 * C_DIM + 6)


def encode_render(packed: jnp.ndarray) -> jnp.ndarray:
    """(CAP, 72) f32 master -> (CAP, 72) bf16 render view.

    Differentiable in the feature columns (d/d(bf16 view) scatter-adds ride
    at half width and arrive as f32 grads on the master); position lanes are
    stop_gradient (positions never receive gradients — pointcloud.py:341).
    """
    n = packed.shape[0]
    feats = packed[:, GEO_SL.start:COL_SL.stop].astype(jnp.bfloat16)
    pos = jax.lax.stop_gradient(packed[:, POS_SL])
    bits = jax.lax.bitcast_convert_type(pos, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(
        (bits >> 16).astype(jnp.uint16), jnp.bfloat16)
    hi_f32 = jax.lax.bitcast_convert_type(
        bits & jnp.uint32(0xFFFF0000), jnp.float32)
    lo = (pos - hi_f32).astype(jnp.bfloat16)
    pad = jnp.zeros((n, PACK_W - POS_LO_SL.stop), jnp.bfloat16)
    return jnp.concatenate([feats, hi, lo, pad], axis=1)


def neighbor_geo(nb: jnp.ndarray) -> jnp.ndarray:
    """Geometry-feature columns of gathered rows, as f32 (either layout)."""
    return nb[..., GEO_SL].astype(jnp.float32)


def neighbor_col(nb: jnp.ndarray) -> jnp.ndarray:
    """Color-feature columns of gathered rows, as f32 (either layout)."""
    return nb[..., COL_SL].astype(jnp.float32)


def neighbor_pos(nb: jnp.ndarray) -> jnp.ndarray:
    """Positions of gathered rows, as f32 (decodes the hi+lo bf16 pair)."""
    if nb.dtype == jnp.bfloat16:
        return (nb[..., POS_HI_SL].astype(jnp.float32)
                + nb[..., POS_LO_SL].astype(jnp.float32))
    return nb[..., POS_SL]


def _empty_rows(n: int) -> jnp.ndarray:
    row = jnp.zeros((PACK_W,), jnp.float32).at[POS_SL].set(1e6)
    return jnp.tile(row, (n, 1))


def init_cloud(capacity: int, c_dim: int, n_add: int) -> CloudState:
    assert c_dim == C_DIM, "packed layout is fixed at c_dim=32"
    icap = capacity // n_add
    return CloudState(
        packed=_empty_rows(capacity),
        n_points=jnp.zeros((), jnp.int32),
        input_pos=jnp.zeros((icap, 3), jnp.float32),
        input_rgb=jnp.zeros((icap, 3), jnp.float32),
        n_inputs=jnp.zeros((), jnp.int32),
    )


def grow_cloud(state: CloudState, new_capacity: int, n_add: int) -> CloudState:
    """Host-side capacity doubling (bounded recompiles)."""
    cap = state.packed.shape[0]
    extra = new_capacity - cap
    icap_extra = new_capacity // n_add - state.input_pos.shape[0]
    return CloudState(
        packed=jnp.concatenate([state.packed, _empty_rows(extra)]),
        n_points=state.n_points,
        input_pos=jnp.concatenate(
            [state.input_pos, jnp.zeros((icap_extra, 3), jnp.float32)]),
        input_rgb=jnp.concatenate(
            [state.input_rgb, jnp.zeros((icap_extra, 3), jnp.float32)]),
        n_inputs=state.n_inputs,
    )


@functools.partial(jax.jit, static_argnames=(
    "n_add", "fix_interval", "use_dedup"))
def add_points(state: CloudState, index: knn.GridIndex,
               rays_o: jnp.ndarray, rays_d: jnp.ndarray,
               gt_depth: jnp.ndarray, gt_color: jnp.ndarray,
               ray_valid: jnp.ndarray, dedup_radius: jnp.ndarray,
               key: jnp.ndarray,
               near_end_surface: jnp.ndarray, far_end_surface: jnp.ndarray,
               n_add: int = 3, fix_interval: bool = False,
               use_dedup: bool = True,
               ) -> Tuple[CloudState, jnp.ndarray]:
    """Densify the cloud from a fixed-size candidate ray batch.

    Returns (new_state, n_accepted_locations). The caller must guarantee
    capacity for n_valid_rays * n_add new points (grow_cloud beforehand).
    """
    cap = state.packed.shape[0]
    icap = state.input_pos.shape[0]
    b = rays_o.shape[0]

    valid = ray_valid & (gt_depth > 0)
    pts_gt = rays_o + rays_d * gt_depth[:, None]

    if use_dedup:
        d, i, v = knn.grid_knn(index, pts_gt, k=8)
        counts = knn.neighbor_count(d, v, dedup_radius)
        # an untrained/empty cloud accepts everything (index.is_trained False
        # branch of src/neural_point.py:118)
        counts = jnp.where(state.n_points > 0, counts, 0)
        accept = valid & (counts == 0)
    else:
        accept = valid

    # ---- input locations (one row per accepted ray)
    loc_off = jnp.cumsum(accept.astype(jnp.int32)) - 1
    loc_dst = jnp.where(accept, state.n_inputs + loc_off, icap)  # icap = dropped
    loc_dst = jnp.minimum(loc_dst, icap)  # out-of-range rows dropped by scatter
    input_pos = state.input_pos.at[loc_dst].set(pts_gt, mode="drop")
    input_rgb = state.input_rgb.at[loc_dst].set(gt_color * 255.0, mode="drop")
    n_acc = jnp.sum(accept.astype(jnp.int32))

    # ---- neural points: n_add per accepted location along the ray
    t_vals = jnp.linspace(0.0, 1.0, n_add)
    if fix_interval:
        z_vals = gt_depth[:, None] + jnp.linspace(-0.04, 0.04, n_add)[None, :]
    else:
        z_vals = (near_end_surface * gt_depth[:, None] * (1.0 - t_vals)[None, :]
                  + far_end_surface * gt_depth[:, None] * t_vals[None, :])
    new_pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]  # (B,n_add,3)

    pt_dst = jnp.where(accept[:, None],
                       state.n_points + loc_off[:, None] * n_add
                       + jnp.arange(n_add)[None, :], cap)
    pt_dst = jnp.minimum(pt_dst, cap).reshape(-1)

    kg, kc = jax.random.split(key)
    rows = jnp.zeros((b * n_add, PACK_W), jnp.float32)
    rows = rows.at[:, GEO_SL].set(
        0.1 * jax.random.normal(kg, (b * n_add, C_DIM), jnp.float32))
    rows = rows.at[:, COL_SL].set(
        0.1 * jax.random.normal(kc, (b * n_add, C_DIM), jnp.float32))
    rows = rows.at[:, POS_SL].set(new_pts.reshape(-1, 3))
    packed = state.packed.at[pt_dst].set(rows, mode="drop")

    new_state = CloudState(
        packed=packed,
        n_points=state.n_points + n_acc * n_add,
        input_pos=input_pos, input_rgb=input_rgb,
        n_inputs=state.n_inputs + n_acc)
    return new_state, n_acc


def build_index(state: CloudState, cell_size, table_size: int = 1 << 16,
                max_per_cell: int = 96, packed_coords=False):
    """packed_coords: False (f32 planes), True (packed coords + id plane),
    or 'fused' (one coords|ids plane — halves kNN probe gather rows)."""
    build = (knn.build_fused_grid_index if packed_coords == "fused"
             else knn.build_packed_grid_index if packed_coords
             else knn.build_grid_index)
    return build(state.pos, state.n_points,
                 jnp.asarray(cell_size, jnp.float32),
                 table_size, max_per_cell)


@functools.partial(jax.jit, static_argnames=("m",))
def insert_index(state: CloudState, index: knn.GridIndex,
                 n_old, m: int) -> knn.GridIndex:
    """Fold rows [n_old, n_points) — at most ``m`` of them (the static
    densify batch bound) — into the cell table. Bit-identical to a full
    build_index over the grown cloud (points only ever append; see
    knn.insert_grid_index).

    HARD PRECONDITION: n_old + m <= capacity. dynamic_slice CLAMPS an
    out-of-range start, so violating this silently misaligns the sliced
    rows against ids = n_old + arange(m) and corrupts the index. Every
    call site must guarantee capacity first (the mapper does, via
    _ensure_capacity before densification)."""
    start = jnp.asarray(n_old, jnp.int32)
    rows = jax.lax.dynamic_slice(state.pos, (start, jnp.int32(0)), (m, 3))
    ids = start + jnp.arange(m, dtype=jnp.int32)
    valid = ids < state.n_points
    return knn.insert_grid_index(index, rows, ids, valid)


@functools.partial(jax.jit, static_argnames=("num", "intervals"))
def sample_near_pcl(index: knn.GridIndex,
                    rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                    near, far, r_query: jnp.ndarray,
                    num: int = 5, intervals: int = 25):
    """Depth-free rays: march `intervals` coarse samples, keep rays with >=2
    samples near the cloud and place `num` z-values between the first two such
    samples (faithful to src/neural_point.py:217-277, including the quirk that
    the segment ends at the *second* near-cloud sample, not the last).

    Returns (z_vals (R,num), invalid_mask (R,) True where not near the cloud).
    """
    r = rays_o.shape[0]
    z_sec = jnp.linspace(near, far, intervals)                 # (I,)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_sec[None, :, None]
    d, i, v = knn.grid_knn(index, pts.reshape(-1, 3), k=8)
    rq = jnp.asarray(r_query, jnp.float32)
    if rq.ndim == 1 and rq.shape[0] == r:
        rq = jnp.repeat(rq, intervals)                         # per-ray radius
    counts = knn.neighbor_count(d, v, rq).reshape(r, intervals)
    has = counts > 0                                           # (R,I)
    n_near = jnp.sum(has.astype(jnp.int32), axis=1)
    invalid = n_near < 2

    order = jnp.argsort(~has, axis=1, stable=True)             # near samples first
    first = z_sec[order[:, 0]]
    second = z_sec[order[:, 1]]
    t = jnp.linspace(0.0, 1.0, num)
    z_near = first[:, None] * (1 - t)[None, :] + second[:, None] * t[None, :]
    z_uniform = jnp.broadcast_to(jnp.linspace(near, far, num), (r, num))
    z_vals = jnp.where(invalid[:, None], z_uniform, z_near)
    return z_vals.astype(jnp.float32), invalid


@jax.jit
def frustum_mask(pos: jnp.ndarray, n_points: jnp.ndarray, w2c: jnp.ndarray,
                 depth: jnp.ndarray, fx, fy, cx, cy, edge) -> jnp.ndarray:
    """Which cloud points are optimizable for the current frame.

    Parity with Mapper.get_mask_from_c2w (src/Mapper.py:120-168): project all
    points (x-axis flipped), bilinear depth lookup with zero-outside border
    (cv2.remap INTER_LINEAR), zero depth samples replaced by the max sampled
    depth, then mask = inside enlarged frustum and 0 <= -z <= depth + 0.5.
    """
    from point_slam_tpu.common.camera import project_points
    h, w = depth.shape
    u, v, z = project_points(pos, w2c, fx, fy, cx, cy)

    x0 = jnp.floor(u).astype(jnp.int32)
    y0 = jnp.floor(v).astype(jnp.int32)
    du = u - x0
    dv = v - y0

    def tap(yy, xx):
        inside = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        val = depth[jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]
        return jnp.where(inside, val, 0.0)

    d00 = tap(y0, x0)
    d01 = tap(y0, x0 + 1)
    d10 = tap(y0 + 1, x0)
    d11 = tap(y0 + 1, x0 + 1)
    samp = (d00 * (1 - du) * (1 - dv) + d01 * du * (1 - dv)
            + d10 * (1 - du) * dv + d11 * du * dv)

    samp = jnp.where(samp == 0.0, jnp.max(samp), samp)
    mask = (u < w - edge) & (u > edge) & (v < h - edge) & (v > edge)
    mask &= (0 <= -z) & (-z <= samp + 0.5)
    mask &= jnp.arange(pos.shape[0]) < n_points
    return mask
