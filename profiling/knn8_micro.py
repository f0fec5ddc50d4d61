"""27-probe (cell=r_max, C=96) vs 8-probe (cell=2*r_max, C=384) kNN shapes.

The 8-probe variant picks, per axis, the two cells touched by the query ball
(floor((q-r)/s), floor((q+r)/s)); with s >= 2*r_max this covers the ball
exactly. Fewer but wider gather rows — wins iff row-count-bound.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

Q = 25_000
K = 8
N = 20

rng = np.random.default_rng(0)
T27, C27 = 1 << 16, 96
T8, C8 = 1 << 14, 384
BIG = dict(
    t27=jnp.asarray(rng.standard_normal((T27, C27, 4)), jnp.float32),
    t8=jnp.asarray(rng.standard_normal((T8, C8, 4)), jnp.float32),
    q=jnp.asarray(rng.uniform(0, 6, (Q, 3)), jnp.float32),
    r=jnp.asarray(rng.uniform(0.04, 0.16, (Q,)), jnp.float32),
)


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


from point_slam_tpu.ops.knn import _hash_cells, _OFFSETS


def jitter(k, q):
    return q + jax.random.normal(k, q.shape) * 1e-4


def knn27(k, b):
    q = jitter(k, b["q"])
    cell = 0.16
    qc = jnp.floor(q / cell).astype(jnp.int32)
    hs = _hash_cells(qc[:, None, :] + _OFFSETS[None], T27).astype(jnp.int32)
    dup = (hs[:, :, None] == hs[:, None, :]) & (
        jnp.arange(27)[None, :, None] > jnp.arange(27)[None, None, :])
    ok = ~jnp.any(dup, -1)
    blk = b["t27"][hs]
    d2 = jnp.sum((blk[..., :3] - q[:, None, None, :]) ** 2, -1)
    d2 = jnp.where(ok[:, :, None], d2, jnp.inf).reshape(Q, -1)
    neg, p = jax.lax.top_k(-d2, K)
    return mix(k, jnp.where(jnp.isfinite(neg), neg, 0.0))


def knn8(k, b):
    q = jitter(k, b["q"])
    cell = 0.32
    r = b["r"][:, None]
    lo = jnp.floor((q - r) / cell).astype(jnp.int32)    # (Q,3)
    hi = jnp.floor((q + r) / cell).astype(jnp.int32)
    bits = ((jnp.arange(8)[:, None] >> jnp.arange(3)[None, :]) & 1) == 1
    cells = jnp.where(bits[None], hi[:, None, :], lo[:, None, :])  # (Q,8,3)
    hs = _hash_cells(cells, T8).astype(jnp.int32)
    dup = (hs[:, :, None] == hs[:, None, :]) & (
        jnp.arange(8)[None, :, None] > jnp.arange(8)[None, None, :])
    ok = ~jnp.any(dup, -1)
    blk = b["t8"][hs]                                   # (Q,8,C8,4)
    d2 = jnp.sum((blk[..., :3] - q[:, None, None, :]) ** 2, -1)
    d2 = jnp.where(ok[:, :, None], d2, jnp.inf).reshape(Q, -1)
    neg, p = jax.lax.top_k(-d2, K)
    return mix(k, jnp.where(jnp.isfinite(neg), neg, 0.0))


t27 = chain("27-probe C=96 ", knn27)
t8 = chain(" 8-probe C=384", knn8)
