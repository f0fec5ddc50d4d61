"""Calibrated timing: single-call latency + known-cost control ops."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

TABLE = 1 << 16
C = 96
Q = 25_000
K = 8

rng = np.random.default_rng(0)
tableT = jnp.asarray(rng.standard_normal((TABLE, 4, C)), jnp.float32)
tableR = jnp.asarray(rng.standard_normal((TABLE, C, 4)), jnp.float32)
ids = jnp.asarray(rng.integers(0, TABLE, (Q, 27)), jnp.int32)
qpos = jnp.asarray(rng.standard_normal((Q, 3)), jnp.float32)

# control: 4096^3 matmul = 137 GFLOP -> ~1.5-3 ms on v5e
A = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.float32)
jax.block_until_ready((tableT, tableR, ids, qpos, A))


def knn_T(t, i, q):
    blk = t[i]
    d2 = ((blk[:, :, 0] - q[:, None, 0, None]) ** 2
          + (blk[:, :, 1] - q[:, None, 1, None]) ** 2
          + (blk[:, :, 2] - q[:, None, 2, None]) ** 2)
    cid = jax.lax.bitcast_convert_type(blk[:, :, 3], jnp.int32)
    neg, p = jax.lax.top_k(-d2.reshape(Q, 27 * C), K)
    return -neg, jnp.take_along_axis(cid.reshape(Q, 27 * C), p, 1)


def knn_R(t, i, q):
    blk = t[i]
    diff = blk[..., :3] - q[:, None, None, :]
    d2 = jnp.sum(diff * diff, -1)
    cid = jax.lax.bitcast_convert_type(blk[..., 3], jnp.int32)
    neg, p = jax.lax.top_k(-d2.reshape(Q, 27 * C), K)
    return -neg, jnp.take_along_axis(cid.reshape(Q, 27 * C), p, 1)


def control(a):
    return a @ a


def fetch(out):
    if isinstance(out, tuple):
        return np.asarray(out[0].ravel()[:4])
    return np.asarray(out.ravel()[:4])

def single(name, fn, *args, n=8):
    f = jax.jit(fn)
    fetch(f(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fetch(f(*args))
        ts.append(time.perf_counter() - t0)
    ts = sorted(ts)
    print(f"{name}: median single-call {ts[n//2]*1e3:8.2f} ms  min {ts[0]*1e3:8.2f}")


single("control matmul 4096^3 (~137GF)", control, A)
single("noop tiny add                 ", lambda x: x + 1.0, jnp.ones((8, 128)))
single("knn lane-major (TABLE,4,C)    ", knn_T, tableT, ids, qpos)
single("knn row-major  (TABLE,C,4)    ", knn_R, tableR, ids, qpos)
