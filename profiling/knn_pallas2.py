"""v4: box-enumerated ray-shared probes + gather + transpose + Pallas top-8.

Stages (one jit):
  1. box probes: per-ray cell bbox +1 margin, static 4x4x4 offset grid,
     per-axis validity mask, hash-collision dedup among the 64, sentinel
     bucket TABLE for invalid (table carries a +inf sentinel row)
  2. ONE gather (R, 64, C, 4)
  3. ONE transpose -> (R, 4, 64, C) -> reshape (R, 4*64*C): planes are
     contiguous lane slices for the kernel
  4. Pallas: per sample d2 + top-8 via packed (quantized-d2|lane) min-reduce,
     winner ids extracted in-kernel by masked sum (no epilogue gathers)
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
from point_slam_tpu.ops.knn import _hash_cells

CAP = 1 << 19
NPTS = 300_000
R = 5000
NS = 5
CELL = 0.16
TABLE = 1 << 16
C = 64
K = 8
P = 64            # 4x4x4 box offsets
R_BLK = 32
N = 30
_LANE_MASK = 8191   # P*C = 4096 < 8192

rng = np.random.default_rng(0)
u = rng.uniform(0, 6, (NPTS, 2)).astype(np.float32)
pts = np.stack([u[:, 0], u[:, 1], 2.0 + 0.3 * np.sin(u[:, 0] * 3)], -1
               ).astype(np.float32)
pos = np.full((CAP, 3), 1e6, np.float32)
pos[:NPTS] = pts
points = jnp.asarray(pos)
index0 = knn.build_grid_index(points, jnp.asarray(NPTS), jnp.asarray(CELL),
                              TABLE, C)
# sentinel row appended: bucket TABLE is all +inf
table_s = jnp.concatenate(
    [index0.table, jnp.full((1, C, 4), jnp.inf, jnp.float32)], axis=0)

o = np.concatenate([rng.uniform(0.5, 5.5, (R, 2)), np.zeros((R, 1))],
                   -1).astype(np.float32)
d = np.concatenate([rng.normal(0, 0.05, (R, 2)), np.ones((R, 1))],
                   -1).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
depth = (2.0 + 0.3 * np.sin(o[:, 0] * 3)).astype(np.float32)
t = np.linspace(0.98, 1.02, NS).astype(np.float32)
zv = depth[:, None] * t[None, :]
q_ray = (o[:, None, :] + d[:, None, :] * zv[..., None]).astype(np.float32)

BIG = dict(table=table_s, q=jnp.asarray(q_ray))
CELLJ = jnp.asarray(CELL, jnp.float32)

_OFF64 = jnp.array([[x, y, z] for x in range(4) for y in range(4)
                    for z in range(4)], jnp.int32)          # (64, 3)


def chain(name, step):
    @jax.jit
    def run(key, big):
        return jax.lax.fori_loop(0, N, lambda i, k: step(k, big), key)
    k0 = jax.random.key(0)
    t0 = time.time()
    float(jax.random.key_data(run(k0, BIG))[0])
    ct = time.time() - t0
    t0 = time.time()
    float(jax.random.key_data(run(k0, BIG))[0])
    dt = (time.time() - t0) / N
    print(f"{name}: {dt*1e3:7.2f} ms/iter (compile {ct:.0f}s)", flush=True)
    return dt


def mix(k, *xs):
    s = sum((jnp.sum(x) * 0.0).astype(jnp.int32) for x in xs)
    return jax.random.fold_in(k, s + 1)


def jitter(k, b):
    return b["q"] + 0.002 * jax.random.normal(k, b["q"].shape)


def box_probes(q):
    """q (R, NS, 3) -> (R, 64) bucket ids, sentinel TABLE for invalid/dup."""
    qc = jnp.floor(q / CELLJ).astype(jnp.int32)              # (R,NS,3)
    cmin = jnp.min(qc, axis=1) - 1
    cmax = jnp.max(qc, axis=1) + 1
    start = jnp.where(cmax - cmin + 1 > 4, cmin + 1, cmin)   # drop near margin
    cells = start[:, None, :] + _OFF64[None]                 # (R,64,3)
    ok = jnp.all(_OFF64[None] <= (cmax - start)[:, None, :], axis=-1)
    h = _hash_cells(cells, TABLE).astype(jnp.int32)
    h = jnp.where(ok, h, TABLE)
    dup = (h[:, :, None] == h[:, None, :]) & (
        jnp.arange(P)[None, :, None] > jnp.arange(P)[None, None, :])
    return jnp.where(jnp.any(dup, axis=-1), TABLE, h)


def _kernel(cand_ref, qx_ref, qy_ref, qz_ref, out_p_ref, out_i_ref):
    PC = P * C
    X = cand_ref[:, 0 * PC:1 * PC]
    Y = cand_ref[:, 1 * PC:2 * PC]
    Z = cand_ref[:, 2 * PC:3 * PC]
    IDs = cand_ref[:, 3 * PC:4 * PC]
    lane = jax.lax.broadcasted_iota(jnp.int32, X.shape, 1)
    for s in range(NS):
        dx = X - qx_ref[:, s][:, None]
        dy = Y - qy_ref[:, s][:, None]
        dz = Z - qz_ref[:, s][:, None]
        d2 = dx * dx + dy * dy + dz * dz
        packed = ((jax.lax.bitcast_convert_type(d2, jnp.int32)
                   & ~jnp.int32(_LANE_MASK)) | lane)
        for kk in range(K):
            m = jnp.min(packed, axis=-1, keepdims=True)      # (R_BLK, 1)
            sel = lane == (m & _LANE_MASK)
            out_p_ref[:, s * K + kk] = m[:, 0]
            out_i_ref[:, s * K + kk] = jnp.sum(
                jnp.where(sel, IDs, 0.0), axis=-1)
            packed = jnp.where(sel, jnp.int32(0x7FFFFFFF), packed)


def pallas_topk(cand, qx, qy, qz, r):
    bs_c = pl.BlockSpec((R_BLK, 4 * P * C), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    bs_q = pl.BlockSpec((R_BLK, NS), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    bs_o = pl.BlockSpec((R_BLK, NS * K), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=(r // R_BLK,),
        in_specs=[bs_c, bs_q, bs_q, bs_q],
        out_specs=(bs_o, bs_o),
        out_shape=(jax.ShapeDtypeStruct((r, NS * K), jnp.int32),
                   jax.ShapeDtypeStruct((r, NS * K), jnp.float32)),
    )(cand, qx, qy, qz)


def knn_rays(table, q):
    r = q.shape[0]
    probes = box_probes(q)                                   # (R,64)
    blocks = table[probes]                                   # (R,P,C,4)
    cand = jnp.transpose(blocks, (0, 3, 1, 2)).reshape(r, 4 * P * C)
    packed, ids = pallas_topk(cand, q[..., 0], q[..., 1], q[..., 2], r)
    valid = packed < jnp.int32(0x7F800000)
    idx = jnp.where(valid, ids, 0.0).astype(jnp.int32)
    # quantized d2 (upper bound error 2^-18 relative); exact recompute is the
    # caller's job from gathered winner coordinates
    d2q = jax.lax.bitcast_convert_type(packed & ~jnp.int32(_LANE_MASK),
                                       jnp.float32)
    d2q = jnp.where(valid, d2q, jnp.inf)
    return (d2q.reshape(r * NS, K), idx.reshape(r * NS, K),
            valid.reshape(r * NS, K))


def v4(k, b):
    q = jitter(k, b)
    d2, idx, valid = knn_rays(b["table"], q)
    return mix(k, d2, idx)


def v0(k, b):
    q = jitter(k, b).reshape(-1, 3)
    dists, idx, valid = knn.grid_knn(index0, q, k=K)
    return mix(k, dists, idx)


def s_probes(k, b):
    return mix(k, box_probes(jitter(k, b)))


def s_gather(k, b):
    q = jitter(k, b)
    return mix(k, b["table"][box_probes(q)])


def s_trans(k, b):
    q = jitter(k, b)
    blocks = b["table"][box_probes(q)]
    return mix(k, jnp.transpose(blocks, (0, 3, 1, 2)).reshape(R, 4 * P * C))


if __name__ == "__main__":
    qj = jnp.asarray(q_ray)
    d0, i0, m0 = knn.grid_knn(index0, qj.reshape(-1, 3), k=K)
    d4, i4, m4 = knn_rays(table_s, qj)
    # exact d2 recomputed from ids for comparison
    w = np.asarray(points)[np.asarray(i4)]                   # (Q,K,3)
    qq = np.asarray(qj).reshape(-1, 1, 3)
    d4e = np.where(np.asarray(m4), ((w - qq) ** 2).sum(-1), np.inf)
    a = np.sort(np.asarray(d0), axis=1)
    bd = np.sort(d4e, axis=1)
    ok = np.isclose(a, bd, rtol=1e-5, atol=1e-10) | ~np.isfinite(a)
    print(f"v4 top-{K} dist-set match vs v0: {ok.mean()*100:.4f}%  "
          f"(valid agree {np.mean(np.asarray(m0)==np.asarray(m4))*100:.3f}%)",
          flush=True)

    chain("v0 per-sample grid_knn ", v0)
    chain("s1 box probes          ", s_probes)
    chain("s2 +gather             ", s_gather)
    chain("s3 +transpose          ", s_trans)
    chain("v4 full                ", v4)


# --- v5: compact the probes (valid ones first) to a P2-slot budget
P2 = 40


def box_probes_compact(q):
    qc = jnp.floor(q / CELLJ).astype(jnp.int32)
    cmin = jnp.min(qc, axis=1) - 1
    cmax = jnp.max(qc, axis=1) + 1
    start = jnp.where(cmax - cmin + 1 > 4, cmin + 1, cmin)
    cells = start[:, None, :] + _OFF64[None]
    ok = jnp.all(_OFF64[None] <= (cmax - start)[:, None, :], axis=-1)
    h = _hash_cells(cells, TABLE).astype(jnp.int32)
    dup = (h[:, :, None] == h[:, None, :]) & (
        jnp.arange(P)[None, :, None] > jnp.arange(P)[None, None, :])
    ok &= ~jnp.any(dup, axis=-1)
    dst = jnp.cumsum(ok, axis=1) - 1
    dst = jnp.where(ok & (dst < P2), dst, P2)
    rows = jnp.arange(R, dtype=jnp.int32)[:, None]
    flat = jnp.full((R * (P2 + 1),), TABLE, jnp.int32)
    flat = flat.at[(rows * (P2 + 1) + dst).reshape(-1)].set(
        h.reshape(-1), mode="drop")
    return flat.reshape(R, P2 + 1)[:, :P2]


def _kernel2(cand_ref, qx_ref, qy_ref, qz_ref, out_p_ref, out_i_ref):
    PC = P2 * C
    X = cand_ref[:, 0 * PC:1 * PC]
    Y = cand_ref[:, 1 * PC:2 * PC]
    Z = cand_ref[:, 2 * PC:3 * PC]
    IDs = cand_ref[:, 3 * PC:4 * PC]
    lane = jax.lax.broadcasted_iota(jnp.int32, X.shape, 1)
    for s in range(NS):
        dx = X - qx_ref[:, s][:, None]
        dy = Y - qy_ref[:, s][:, None]
        dz = Z - qz_ref[:, s][:, None]
        d2 = dx * dx + dy * dy + dz * dz
        packed = ((jax.lax.bitcast_convert_type(d2, jnp.int32)
                   & ~jnp.int32(_LANE_MASK)) | lane)
        for kk in range(K):
            m = jnp.min(packed, axis=-1, keepdims=True)
            sel = lane == (m & _LANE_MASK)
            out_p_ref[:, s * K + kk] = m[:, 0]
            out_i_ref[:, s * K + kk] = jnp.sum(
                jnp.where(sel, IDs, 0.0), axis=-1)
            packed = jnp.where(sel, jnp.int32(0x7FFFFFFF), packed)


def pallas_topk2(cand, qx, qy, qz, r):
    bs_c = pl.BlockSpec((R_BLK, 4 * P2 * C), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    bs_q = pl.BlockSpec((R_BLK, NS), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    bs_o = pl.BlockSpec((R_BLK, NS * K), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel2,
        grid=(r // R_BLK,),
        in_specs=[bs_c, bs_q, bs_q, bs_q],
        out_specs=(bs_o, bs_o),
        out_shape=(jax.ShapeDtypeStruct((r, NS * K), jnp.int32),
                   jax.ShapeDtypeStruct((r, NS * K), jnp.float32)),
    )(cand, qx, qy, qz)


def v5(k, b):
    q = jitter(k, b)
    probes = box_probes_compact(q)
    blocks = b["table"][probes]
    cand = jnp.transpose(blocks, (0, 3, 1, 2)).reshape(R, 4 * P2 * C)
    packed, ids = pallas_topk2(cand, q[..., 0], q[..., 1], q[..., 2], R)
    valid = packed < jnp.int32(0x7F800000)
    idx = jnp.where(valid, ids, 0.0).astype(jnp.int32)
    return mix(k, packed, idx)


def s5_probes(k, b):
    return mix(k, box_probes_compact(jitter(k, b)))


def s5_gather(k, b):
    q = jitter(k, b)
    return mix(k, b["table"][box_probes_compact(q)])
