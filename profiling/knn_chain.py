"""Amortized timing via on-device fori_loop chains (defeats tunnel latency)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

TABLE = 1 << 16
C = 96
Q = 25_000
K = 8
N_ITER = 30

rng = np.random.default_rng(0)
tableT = jnp.asarray(rng.standard_normal((TABLE, 4, C)), jnp.float32)
tableR = jnp.asarray(rng.standard_normal((TABLE, C, 4)), jnp.float32)
qpos0 = jnp.asarray(rng.standard_normal((Q, 3)), jnp.float32)
A = jnp.asarray(rng.standard_normal((4096, 4096)) * 1e-3, jnp.float32)
cell = jnp.asarray(0.13, jnp.float32)
jax.block_until_ready((tableT, tableR, qpos0, A))

from point_slam_tpu.ops.knn import _hash_cells, _OFFSETS


def probes(q):
    qcells = jnp.floor(q / cell).astype(jnp.int32)
    pc = qcells[:, None, :] + _OFFSETS[None, :, :]
    return _hash_cells(pc, TABLE).astype(jnp.int32)


def knn_T(t, q):
    i = probes(q)
    blk = t[i]
    d2 = ((blk[:, :, 0] - q[:, None, 0, None]) ** 2
          + (blk[:, :, 1] - q[:, None, 1, None]) ** 2
          + (blk[:, :, 2] - q[:, None, 2, None]) ** 2)
    neg, p = jax.lax.top_k(-d2.reshape(Q, 27 * C), K)
    return -neg


def knn_R(t, q):
    i = probes(q)
    blk = t[i]
    diff = blk[..., :3] - q[:, None, None, :]
    d2 = jnp.sum(diff * diff, -1)
    neg, p = jax.lax.top_k(-d2.reshape(Q, 27 * C), K)
    return -neg


def bench_chain(name, step, x0, n=N_ITER):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, n, lambda i, c: step(c), x)
    np.asarray(run(x0)).ravel()[:1]  # compile+warm
    t0 = time.perf_counter()
    r = np.asarray(run(x0)).ravel()[:1]
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:8.2f} ms/iter")


# control
bench_chain("matmul 4096^3 (~137GF)", lambda a: (a @ a) * 1e-3 + 1e-3, A)
# noop-ish chain
bench_chain("elementwise (Q,3)     ", lambda q: q * 0.9999 + 1e-5, qpos0)
# knn chains: feed top-k distances back into the query to serialize
bench_chain("knn lane-major        ",
            lambda q: q + 1e-9 * knn_T(tableT, q)[:, :3], qpos0)
bench_chain("knn row-major         ",
            lambda q: q + 1e-9 * knn_R(tableR, q)[:, :3], qpos0)
