"""Microbenchmark TPU/XLA gather performance for different row widths."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax
import jax.numpy as jnp

def bench(name, fn, *args, n=10):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name}: {dt*1e3:8.2f} ms")
    return dt

rng = np.random.default_rng(0)
CAP = 1 << 19

# A: tiny-row gather (current kNN candidate fetch)
src3 = jnp.asarray(rng.standard_normal((CAP, 3)), jnp.float32)
idxA = jnp.asarray(rng.integers(0, CAP, 25_000 * 27 * 96), jnp.int32)
dtA = bench("A  (CAP,3) rows x 64.8M idx", lambda s, i: s[i].sum(), src3, idxA, n=3)
print(f"   -> {idxA.size*12/dtA/1e9:.1f} GB/s")

# B: feature gather (Q*ns*8 neighbors x 32-d feats)
src32 = jnp.asarray(rng.standard_normal((CAP, 32)), jnp.float32)
idxB = jnp.asarray(rng.integers(0, CAP, 25_000 * 8), jnp.int32)
dtB = bench("B  (CAP,32) rows x 200k idx", lambda s, i: s[i].sum(), src32, idxB, n=10)
print(f"   -> {idxB.size*128/dtB/1e9:.1f} GB/s")

# C: cell-block gather (TABLE, C*4) wide rows
TABLE = 1 << 16
C = 96
srcC = jnp.asarray(rng.standard_normal((TABLE, C * 4)), jnp.float32)
idxC = jnp.asarray(rng.integers(0, TABLE, 25_000 * 27), jnp.int32)
dtC = bench("C  (64k,384) rows x 675k idx", lambda s, i: s[i].sum(), srcC, idxC, n=10)
print(f"   -> {idxC.size*C*16/dtC/1e9:.1f} GB/s")

# C2: same but 32 wide cells
C2 = 32
srcC2 = jnp.asarray(rng.standard_normal((TABLE, C2 * 4)), jnp.float32)
dtC2 = bench("C2 (64k,128) rows x 675k idx", lambda s, i: s[i].sum(), srcC2, idxC, n=10)
print(f"   -> {idxC.size*C2*16/dtC2/1e9:.1f} GB/s")

# D: scatter-add of feature grads
updB = jnp.asarray(rng.standard_normal((idxB.size, 32)), jnp.float32)
dtD = bench("D  scatter-add 200k x 32", lambda i, u: jnp.zeros((CAP, 32)).at[i].add(u).sum(),
            idxB, updB, n=10)
print(f"   -> {idxB.size*128/dtD/1e9:.1f} GB/s")

# E: searchsorted cost (current index probe)
keys = jnp.sort(jnp.asarray(rng.integers(0, 1 << 20, CAP), jnp.int32))
q = jnp.asarray(rng.integers(0, 1 << 20, 675_000), jnp.int32)
bench("E  searchsorted 512k x 675k", lambda k, qq: jnp.searchsorted(k, qq).sum(), keys, q, n=10)

# F: top_k over (25k*5, 2592)
d2 = jnp.asarray(rng.standard_normal((25_000, 2592)), jnp.float32)
bench("F  top_k (25k,2592) k=8", lambda d: jax.lax.top_k(d, 8)[0].sum(), d2, n=10)

# G: top_k over (675k, 104) - per-probe streaming merge alternative
d3 = jnp.asarray(rng.standard_normal((25_000, 104)), jnp.float32)
bench("G  top_k (25k,104) k=8", lambda d: jax.lax.top_k(d, 8)[0].sum(), d3, n=10)

# H: sort-based gather: sort 675k keys
bench("H  argsort 675k int32", lambda x: jnp.argsort(x).sum(), q, n=10)
