"""v3: ray-shared probes + XLA gather + Pallas fused d2/top-8 kernel.

Pipeline (all one jit):
  1. XLA: per-ray probe buckets, deduped to a budget P (sorted+scatter)
  2. XLA: ONE wide gather of (R, P, C, 4) candidate blocks
  3. XLA: unpack to X/Y/Z/ID planes (R, P*C)
  4. Pallas: for each of ns samples, d2 against the ray's shared candidates
     and top-8 extraction via packed (quantized-d2 | lane) int32 min-reduce
  5. XLA: winner ids/coords via tiny take_along_axis; exact d2 recomputed
     from coordinates (so quantization never reaches the algorithm)

Compare cost + results vs v0 (per-sample grid_knn).
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
from point_slam_tpu.ops.knn import _hash_cells, _OFFSETS

CAP = 1 << 19
NPTS = 300_000
R = 5000
NS = 5
CELL = 0.16
TABLE = 1 << 16
C = 64
K = 8
P = 48            # unique-bucket budget per ray
R_BLK = 32
N = 30

rng = np.random.default_rng(0)
u = rng.uniform(0, 6, (NPTS, 2)).astype(np.float32)
pts = np.stack([u[:, 0], u[:, 1], 2.0 + 0.3 * np.sin(u[:, 0] * 3)], -1
               ).astype(np.float32)
pos = np.full((CAP, 3), 1e6, np.float32)
pos[:NPTS] = pts
points = jnp.asarray(pos)
index = knn.build_grid_index(points, jnp.asarray(NPTS), jnp.asarray(CELL),
                             TABLE, C)

o = np.concatenate([rng.uniform(0.5, 5.5, (R, 2)), np.zeros((R, 1))],
                   -1).astype(np.float32)
d = np.concatenate([rng.normal(0, 0.05, (R, 2)), np.ones((R, 1))],
                   -1).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
depth = (2.0 + 0.3 * np.sin(o[:, 0] * 3)).astype(np.float32)
t = np.linspace(0.98, 1.02, NS).astype(np.float32)
zv = depth[:, None] * t[None, :]
q_ray = (o[:, None, :] + d[:, None, :] * zv[..., None]).astype(np.float32)

BIG = dict(index=index, q=jnp.asarray(q_ray))


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


def v0(k, b):
    q = jitter(k, b).reshape(-1, 3)
    dists, idx, valid = knn.grid_knn(b["index"], q, k=K)
    return mix(k, dists, idx)


def ray_probes(q, index, r, m_probe):
    qcells = jnp.floor(q / index.cell_size).astype(jnp.int32)
    hs = _hash_cells(qcells[:, :, None, :] + _OFFSETS[None, None],
                     TABLE).astype(jnp.int32).reshape(r, -1)
    hs = jnp.sort(hs, axis=1)
    first = jnp.concatenate(
        [jnp.ones((r, 1), bool), hs[:, 1:] != hs[:, :-1]], axis=1)
    rank = jnp.cumsum(first, axis=1) - 1
    dst = jnp.where(first & (rank < m_probe), rank, m_probe)
    flat_dst = (jnp.arange(r, dtype=jnp.int32)[:, None] * (m_probe + 1)
                + dst).reshape(-1)
    probes = jnp.full((r * (m_probe + 1),), TABLE, jnp.int32)
    probes = probes.at[flat_dst].set(hs.reshape(-1), mode="drop")
    return probes.reshape(r, m_probe + 1)[:, :m_probe]


_LANE_MASK = 4095  # P*C = 3072 < 4096


def _topk_kernel(x_ref, y_ref, z_ref, qx_ref, qy_ref, qz_ref, out_ref):
    X, Y, Z = x_ref[:], y_ref[:], z_ref[:]
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
            out_ref[:, s * K + kk] = m[:, 0]
            sel = lane == (m & _LANE_MASK)
            packed = jnp.where(sel, jnp.int32(0x7FFFFFFF), packed)


def pallas_topk(X, Y, Z, qx, qy, qz, r):
    grid = (r // R_BLK,)
    bs_c = pl.BlockSpec((R_BLK, P * C), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    bs_q = pl.BlockSpec((R_BLK, NS), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _topk_kernel,
        grid=grid,
        in_specs=[bs_c, bs_c, bs_c, bs_q, bs_q, bs_q],
        out_specs=pl.BlockSpec((R_BLK, NS * K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, NS * K), jnp.int32),
    )(X, Y, Z, qx, qy, qz)


def knn_rays(index, q):
    """q: (R, NS, 3) -> dists (R*NS, K) exact, idx (R*NS, K), valid."""
    r = q.shape[0]
    probes = ray_probes(q, index, r, P)
    blocks = index.table[jnp.clip(probes, 0, TABLE - 1)]    # (R,P,C,4)
    bad = (probes >= TABLE)[:, :, None]
    X = jnp.where(bad, jnp.inf, blocks[..., 0]).reshape(r, P * C)
    Y = blocks[..., 1].reshape(r, P * C)
    Z = blocks[..., 2].reshape(r, P * C)
    ids = blocks[..., 3].reshape(r, P * C)
    packed = pallas_topk(X, Y, Z, q[..., 0], q[..., 1], q[..., 2], r)
    pos = packed & _LANE_MASK                               # (R, NS*K)
    valid = packed < jnp.int32(0x7F800000)                  # quantized-inf
    wx = jnp.take_along_axis(X, pos, axis=1)
    wy = jnp.take_along_axis(Y, pos, axis=1)
    wz = jnp.take_along_axis(Z, pos, axis=1)
    wid = jnp.take_along_axis(ids, pos, axis=1)
    qq = jnp.repeat(q.reshape(r, NS, 1, 3), K, axis=2).reshape(r, NS * K, 3)
    d2 = ((wx - qq[..., 0]) ** 2 + (wy - qq[..., 1]) ** 2
          + (wz - qq[..., 2]) ** 2)
    d2 = jnp.where(valid, d2, jnp.inf).reshape(r * NS, K)
    idx = jnp.where(valid, wid, 0.0).astype(jnp.int32).reshape(r * NS, K)
    return d2, idx, valid.reshape(r * NS, K)


def v3(k, b):
    q = jitter(k, b)
    d2, idx, valid = knn_rays(b["index"], q)
    return mix(k, d2, idx)


if __name__ == "__main__":
    qj = jnp.asarray(q_ray)
    d0, i0, m0 = knn.grid_knn(index, qj.reshape(-1, 3), k=K)
    d3, i3, m3 = knn_rays(index, qj)
    # compare sorted distance sets (quantized packing can reorder ties)
    a = np.sort(np.asarray(d0), axis=1)
    bd = np.sort(np.asarray(d3), axis=1)
    ok = np.isclose(a, bd, rtol=1e-5, atol=1e-10) | ~np.isfinite(a)
    print(f"v3 top-{K} dist-set match vs v0: {ok.mean()*100:.4f}%  "
          f"(valid agree {np.mean(np.asarray(m0)==np.asarray(m3))*100:.3f}%)",
          flush=True)

    chain("v0 per-sample grid_knn   ", v0)
    chain("v3 ray-shared + pallas   ", v3)


def s_probes(k, b):
    q = jitter(k, b)
    return mix(k, ray_probes(q, b["index"], R, P))


def s_gather(k, b):
    q = jitter(k, b)
    probes = ray_probes(q, b["index"], R, P)
    blocks = b["index"].table[jnp.clip(probes, 0, TABLE - 1)]
    return mix(k, blocks)


def s_unpack(k, b):
    q = jitter(k, b)
    probes = ray_probes(q, b["index"], R, P)
    blocks = b["index"].table[jnp.clip(probes, 0, TABLE - 1)]
    bad = (probes >= TABLE)[:, :, None]
    X = jnp.where(bad, jnp.inf, blocks[..., 0]).reshape(R, P * C)
    Y = blocks[..., 1].reshape(R, P * C)
    Z = blocks[..., 2].reshape(R, P * C)
    return mix(k, X, Y, Z)


def s_topk(k, b):
    q = jitter(k, b)
    probes = ray_probes(q, b["index"], R, P)
    blocks = b["index"].table[jnp.clip(probes, 0, TABLE - 1)]
    bad = (probes >= TABLE)[:, :, None]
    X = jnp.where(bad, jnp.inf, blocks[..., 0]).reshape(R, P * C)
    Y = blocks[..., 1].reshape(R, P * C)
    Z = blocks[..., 2].reshape(R, P * C)
    packed = pallas_topk(X, Y, Z, q[..., 0], q[..., 1], q[..., 2], R)
    return mix(k, packed)
