"""C-sweep: max_per_cell 64 -> 48 / 32, and R_BLK 32 -> 64, on the v7 path.

Smaller C cuts candidate lanes (P*C) and gather bytes linearly; recall falls
when occupied cells overflow. Measured occupancy justified 96->64 earlier;
this probes whether 48/32 still hold parity at bench-scale density (300k pts
on a 2.5D surface, cell 0.16 m).
"""
import sys, time
sys.path.insert(0, "/root/repo/profiling")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from knn_pallas2 import (points, NPTS, CELL, TABLE, K, NS, R, q_ray, N,
                         mix, jitter)
from point_slam_tpu.ops import knn

P3 = 48
qj = jnp.asarray(q_ray)
BIGQ = {"q": qj}


def build(c):
    idx = knn.build_grid_index(points, jnp.asarray(NPTS), jnp.asarray(CELL),
                               TABLE, c)
    return idx


def run_variant(name, c, r_blk):
    import point_slam_tpu.ops.knn as K_
    old_blk = K_._RAY_BLK
    K_._RAY_BLK = r_blk
    try:
        idx = build(c)
        d, i, v, compact = K_.ray_grid_knn(idx, qj, k=K)
        i = np.asarray(i).reshape(-1, K)
        v = np.asarray(v).reshape(-1, K)
        w = np.asarray(points)[i]
        qq = np.asarray(qj).reshape(-1, 1, 3)
        dd = np.where(v, ((w - qq) ** 2).sum(-1), np.inf)
        d0, _, _ = knn.grid_knn(build(96), qj.reshape(-1, 3), k=K)
        a = np.sort(np.asarray(d0), axis=1)
        b = np.sort(dd, axis=1)
        ok = np.isclose(a, b, rtol=1e-5, atol=1e-10) | ~np.isfinite(a)
        par = ok.mean() * 100

        @jax.jit
        def chainrun(key, big):
            def body(_, k):
                q = jitter(k, big)
                dk, ik, vk, _ = K_.ray_grid_knn(idx, q, k=K)
                return mix(k, dk, ik)
            return jax.lax.fori_loop(0, N, body, key)
        k0 = jax.random.key(0)
        float(jax.random.key_data(chainrun(k0, BIGQ))[0])
        t0 = time.time()
        float(jax.random.key_data(chainrun(k0, BIGQ))[0])
        dt = (time.time() - t0) / N
        print(f"{name}: {dt*1e3:7.2f} ms/iter  parity {par:.4f}%", flush=True)
    finally:
        K_._RAY_BLK = old_blk


if __name__ == "__main__":
    run_variant("C=64 blk=32 (prod)", 64, 32)
    run_variant("C=48 blk=32       ", 48, 32)
    run_variant("C=32 blk=32       ", 32, 32)
    run_variant("C=64 blk=64       ", 64, 64)
    run_variant("C=48 blk=64       ", 48, 64)
    run_variant("C=64 blk=32 again ", 64, 32)
