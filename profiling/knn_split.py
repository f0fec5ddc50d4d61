"""Split grid_knn cost: gather+d2 vs top_k vs id reconstruction."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from point_slam_tpu.ops import knn
from point_slam_tpu.ops.knn import _hash_cells, _OFFSETS

CAP = 1 << 19
NPTS = 300_000
Q = 25_000
CELL = 0.16
TABLE = 1 << 16
C = 64
K = 8
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
BIG = dict(index=index, base=jnp.asarray(pts[:Q]))


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


def mix(k, x):
    return jax.random.fold_in(k, (jnp.sum(x) * 0.0).astype(jnp.int32) + 1)


def queries(k, b):
    return b["base"] + 0.02 * jax.random.normal(k, (Q, 3))


def common(q, index):
    qcells = jnp.floor(q / index.cell_size).astype(jnp.int32)
    hs = _hash_cells(qcells[:, None, :] + _OFFSETS[None], TABLE).astype(jnp.int32)
    dup = (hs[:, :, None] == hs[:, None, :]) & (
        jnp.arange(27)[None, :, None] > jnp.arange(27)[None, None, :])
    ok = ~jnp.any(dup, -1)
    blk = index.table[hs]
    d2 = jnp.sum((blk[..., :3] - q[:, None, None, :]) ** 2, -1)
    return jnp.where(ok[:, :, None], d2, jnp.inf).reshape(Q, -1), hs


def s_probe(k, b):
    q = queries(k, b)
    qcells = jnp.floor(q / b["index"].cell_size).astype(jnp.int32)
    hs = _hash_cells(qcells[:, None, :] + _OFFSETS[None], TABLE)
    return mix(k, hs.astype(jnp.float32))


def s_dist(k, b):
    d2, _ = common(queries(k, b), b["index"])
    return mix(k, jnp.min(d2, axis=1))


def s_topk(k, b):
    d2, _ = common(queries(k, b), b["index"])
    neg, p = jax.lax.top_k(-d2, K)
    return mix(k, -neg)


def s_full(k, b):
    d, i, v = knn.grid_knn(b["index"], queries(k, b), k=K)
    return mix(k, jnp.where(jnp.isfinite(d), d, 0.0))


def s_approx(k, b):
    d2, _ = common(queries(k, b), b["index"])
    neg, p = jax.lax.approx_max_k(-d2, K, recall_target=0.95)
    return mix(k, jnp.where(jnp.isfinite(neg), neg, 0.0))


chain("probes only          ", s_probe)
chain("gather+d2+min        ", s_dist)
chain("gather+d2+top_k      ", s_topk)
chain("full grid_knn        ", s_full)
chain("gather+d2+approx_topk", s_approx)
