"""Layout experiment: 4 component planes (current) vs ONE quad-planar
table (TABLE+1, 4, C) whose row holds x|y|z|id as four contiguous
C-vectors. TPU gathers are row-count bound, so one 1 KB-row gather per
probe was PREDICTED to beat four 256 B-row gathers (~4x fewer rows), but
MEASURED SLOWER on real TPU (4.89 vs 4.57 ms/iter, 99.98% winner parity)
and the quad layout was reverted — see ops/knn.py docstring; the kernel
slices components from contiguous lane ranges (no strided transpose).

Both variants CONSUME winner ids (the d-only micros dead-coded the id
path and mis-ranked layouts before — see PLAN round-2).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from point_slam_tpu.ops import knn
from point_slam_tpu.ops.knn import (_box_probes, _RAY_BLK, _P_RAY_DEFAULT as _P_RAY,
                                    build_grid_index)

TABLE = 1 << int(os.environ.get("QM_TABLE_LOG2", "16"))
C = 64
NPTS = int(os.environ.get("QM_NPTS", "300000"))
R = int(os.environ.get("QM_RAYS", "5008"))
NS, K = 5, 8
N_ITERS = int(os.environ.get("QM_ITERS", "50"))
CELL = 0.08

rng = np.random.default_rng(0)
u = rng.uniform(-2.5, 2.5, (NPTS, 2)).astype(np.float32)
pts = np.stack([u[:, 0], u[:, 1],
                -2.0 + 0.3 * np.sin(u[:, 0] * 3)], -1).astype(np.float32)
index = build_grid_index(jnp.asarray(pts), jnp.asarray(NPTS),
                         jnp.asarray(CELL), table_size=TABLE, max_per_cell=C)

# ray queries hugging the sheet
centers = pts[rng.integers(0, NPTS, R)]
dirs = rng.normal(size=(R, 3)).astype(np.float32)
dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
depth = rng.uniform(1.5, 4.0, R).astype(np.float32)
t = np.linspace(0.98, 1.02, NS).astype(np.float32)
z = depth[:, None] * t[None, :]
q = (centers - dirs * depth[:, None])[:, None, :] \
    + dirs[:, None, :] * z[..., None]
q = jnp.asarray(q.astype(np.float32))

# quad-planar table: (TABLE+1, 4, C), row = x|y|z|id contiguous
quad = jnp.stack([index.px, index.py, index.pz, index.pid], axis=1)
jax.block_until_ready(quad)

pc = _P_RAY * C
lane_mask = (1 << (pc - 1).bit_length()) - 1


def quad_kernel(ns, k):
    def kernel(t_ref, qx_ref, qy_ref, qz_ref, out_p_ref, out_i_ref):
        T = t_ref[...]                        # (BLK, P*4*C)
        # components: contiguous C-lane slices per probe
        def comp(c0):
            return jnp.concatenate(
                [T[:, p * 4 * C + c0 * C:(p * 4 * C + (c0 + 1) * C)]
                 for p in range(_P_RAY)], axis=1)       # (BLK, P*C)
        X, Y, Z, CI = comp(0), comp(1), comp(2), comp(3)
        lane = jax.lax.broadcasted_iota(jnp.int32, X.shape, 1)
        for s in range(ns):
            dx = X - qx_ref[:, s][:, None]
            dy = Y - qy_ref[:, s][:, None]
            dz = Z - qz_ref[:, s][:, None]
            d2 = dx * dx + dy * dy + dz * dz
            packed = ((jax.lax.bitcast_convert_type(d2, jnp.int32)
                       & ~jnp.int32(lane_mask)) | lane)
            for kk in range(k):
                m = jnp.min(packed, axis=-1, keepdims=True)
                sel = lane == (m & lane_mask)
                out_p_ref[:, s * k + kk] = m[:, 0]
                out_i_ref[:, s * k + kk] = jnp.sum(
                    jnp.where(sel, CI, 0.0), axis=-1)
                packed = jnp.where(sel, jnp.int32(0x7FFFFFFF), packed)
    return kernel


@jax.jit
def ray_knn_quad(quad, q_rays):
    r, ns, _ = q_rays.shape
    probes, compact = _box_probes(q_rays, index.cell_size, TABLE, _P_RAY)
    g = quad[probes].reshape(r, _P_RAY * 4 * C)       # ONE gather
    bs_t = pl.BlockSpec((_RAY_BLK, _P_RAY * 4 * C), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    bs_q = pl.BlockSpec((_RAY_BLK, ns), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    bs_o = pl.BlockSpec((_RAY_BLK, ns * K), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    packed, ids = pl.pallas_call(
        quad_kernel(ns, K),
        grid=(r // _RAY_BLK,),
        in_specs=[bs_t, bs_q, bs_q, bs_q],
        out_specs=[bs_o, bs_o],
        out_shape=[jax.ShapeDtypeStruct((r, ns * K), jnp.int32),
                   jax.ShapeDtypeStruct((r, ns * K), jnp.float32)],
        interpret=jax.default_backend() == "cpu",
    )(g, q_rays[..., 0], q_rays[..., 1], q_rays[..., 2])
    valid = packed < jnp.int32(0x7F800000)
    idx = jnp.where(valid, ids, 0.0).astype(jnp.int32)
    return packed, idx, valid


def planes_kernel(ns, k):
    """Self-contained copy of the 4-plane kernel (the tree may move to the
    quad layout; this micro must keep comparing the two layouts)."""
    def kernel(x_ref, y_ref, z_ref, ci_ref, qx_ref, qy_ref, qz_ref,
               out_p_ref, out_i_ref):
        X, Y, Z, CI = x_ref[...], y_ref[...], z_ref[...], ci_ref[...]
        lane = jax.lax.broadcasted_iota(jnp.int32, X.shape, 1)
        for s in range(ns):
            dx = X - qx_ref[:, s][:, None]
            dy = Y - qy_ref[:, s][:, None]
            dz = Z - qz_ref[:, s][:, None]
            d2 = dx * dx + dy * dy + dz * dz
            packed = ((jax.lax.bitcast_convert_type(d2, jnp.int32)
                       & ~jnp.int32(lane_mask)) | lane)
            for kk in range(k):
                m = jnp.min(packed, axis=-1, keepdims=True)
                sel = lane == (m & lane_mask)
                out_p_ref[:, s * k + kk] = m[:, 0]
                out_i_ref[:, s * k + kk] = jnp.sum(
                    jnp.where(sel, CI, 0.0), axis=-1)
                packed = jnp.where(sel, jnp.int32(0x7FFFFFFF), packed)
    return kernel


px = index.px + 0.0
py = index.py + 0.0
pz = index.pz + 0.0
pid = index.pid + 0.0
jax.block_until_ready((px, py, pz, pid))


@jax.jit
def ray_knn_planes(px, py, pz, pid, q_rays):
    r, ns, _ = q_rays.shape
    probes, compact = _box_probes(q_rays, index.cell_size, TABLE, _P_RAY)
    cx = px[probes].reshape(r, pc)
    cy = py[probes].reshape(r, pc)
    cz = pz[probes].reshape(r, pc)
    ci = pid[probes].reshape(r, pc)
    bs_c = pl.BlockSpec((_RAY_BLK, pc), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    bs_q = pl.BlockSpec((_RAY_BLK, ns), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    bs_o = pl.BlockSpec((_RAY_BLK, ns * K), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    packed, ids = pl.pallas_call(
        planes_kernel(ns, K),
        grid=(r // _RAY_BLK,),
        in_specs=[bs_c, bs_c, bs_c, bs_c, bs_q, bs_q, bs_q],
        out_specs=[bs_o, bs_o],
        out_shape=[jax.ShapeDtypeStruct((r, ns * K), jnp.int32),
                   jax.ShapeDtypeStruct((r, ns * K), jnp.float32)],
        interpret=jax.default_backend() == "cpu",
    )(cx, cy, cz, ci, q_rays[..., 0], q_rays[..., 1], q_rays[..., 2])
    valid = packed < jnp.int32(0x7F800000)
    idx = jnp.where(valid, ids, 0.0).astype(jnp.int32)
    return packed, idx, valid


def bench(name, fn, *args):
    out = fn(*args)
    s = sum(float(np.asarray(jnp.sum(o.astype(jnp.float32))))
            for o in jax.tree_util.tree_leaves(out))
    t0 = time.time()
    for _ in range(N_ITERS):
        out = fn(*args)
    # consume ids (leaf 1) AND dists so nothing is dead code
    np.asarray(jax.tree_util.tree_leaves(out)[1]).ravel()[:1]
    dt = (time.time() - t0) / N_ITERS
    print(f"{name}: {dt*1e3:7.2f} ms  (checksum {s:.3e})", flush=True)
    return out


print(f"devices: {jax.devices()}", flush=True)
o1 = bench("planes           ", ray_knn_planes, px, py, pz, pid, q)
o2 = bench("quad-planar      ", ray_knn_quad, quad, q)

# parity: same winner ids (selection identical: same packed keys)
i1 = np.asarray(o1[1]).reshape(-1, K)
i2 = np.asarray(o2[1]).reshape(-1, K)
eq = (i1 == i2).mean()
print(f"winner-id parity: {eq*100:.3f}%")
