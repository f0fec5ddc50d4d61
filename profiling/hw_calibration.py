"""Calibrate the axon TPU: matmul peak, HBM bandwidth, loop overhead."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)


def bench_chain(name, step, x0, n, work_per_iter, unit):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, n, lambda i, c: step(c), x)
    np.asarray(jax.tree_util.tree_leaves(run(x0))[0].ravel()[:1])
    t0 = time.perf_counter()
    np.asarray(jax.tree_util.tree_leaves(run(x0))[0].ravel()[:1])
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:8.3f} ms/iter -> {work_per_iter/dt/1e12:7.2f} T{unit}/s")


N = 4096
Ab = jnp.asarray(rng.standard_normal((N, N)) * 1e-2, jnp.bfloat16)
Af = Ab.astype(jnp.float32)
jax.block_until_ready((Ab, Af))
flops = 2 * N**3

bench_chain("bf16 matmul 4096^3", lambda a: ((a @ a) * 0.01 + 0.01).astype(jnp.bfloat16), Ab, 30, flops, "FLOP")
bench_chain("f32  matmul 4096^3", lambda a: (a @ a) * 0.01 + 0.01, Af, 10, flops, "FLOP")

big = jnp.asarray(rng.standard_normal((1 << 26,)), jnp.float32)  # 256MB
jax.block_until_ready(big)
bench_chain("copy 256MB (r+w)  ", lambda x: x * 1.0000001, big, 30,
            2 * big.size * 4, "B")

tiny = jnp.ones((8, 128))
bench_chain("loop overhead     ", lambda x: x + 1.0, tiny, 100, 1, "op")
