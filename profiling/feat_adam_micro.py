"""Micro: feature-gather row width + adam layout effects."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

CAP = 1 << 19
Q = 125_000
K = 8
N = 30

rng = np.random.default_rng(0)
BIG = dict(
    f32=jnp.asarray(rng.standard_normal((CAP, 32)), jnp.float32),
    f64=jnp.asarray(rng.standard_normal((CAP, 64)), jnp.float32),
    f72=jnp.asarray(rng.standard_normal((CAP, 72)), jnp.float32),
    f128=jnp.asarray(rng.standard_normal((CAP, 128)), jnp.float32),
    w=jnp.asarray(rng.standard_normal((Q, K)), jnp.float32),
    g32=jnp.asarray(rng.standard_normal((CAP, 32)), jnp.float32),
    m32=jnp.asarray(rng.standard_normal((CAP, 32)), jnp.float32),
    v32=jnp.asarray(np.abs(rng.standard_normal((CAP, 32))), jnp.float32),
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


def idxs(k):
    return jax.random.randint(k, (Q, K), 0, CAP)


base = chain("idx only             ", lambda k, b: mix(k, idxs(k).astype(jnp.float32)))

def g(name, key_arr):
    def s(k, b):
        i = idxs(k)
        neigh = b[key_arr][i]                    # (Q,K,w)
        return mix(k, jnp.sum(b["w"][..., None] * neigh, axis=1))
    return chain(name, s)

t32 = g("gather 32-wide + wsum", "f32")
t64 = g("gather 64-wide + wsum", "f64")
t72 = g("gather 72-wide + wsum", "f72")
t128 = g("gather 128-wide+ wsum", "f128")

# scatter-add (the gather VJP)
def sc(k, b):
    i = idxs(k)
    upd = b["w"][..., None] * jnp.ones((Q, K, 32))
    out = jnp.zeros((CAP, 32)).at[i].add(upd)
    return mix(k, out[0])
chain("scatter-add 32-wide  ", sc)

# adam shapes
def adam2d(k, b):
    p, g_, m, v = b["f32"], b["g32"], b["m32"], b["v32"]
    m = 0.9 * m + 0.1 * g_
    v = 0.999 * v + 0.001 * g_ * g_
    out = p - 0.01 * (m / 0.5) / (jnp.sqrt(v / 0.5) + 1e-8)
    return mix(k, out[0] + m[0] + v[0])
chain("adam one leaf (CAP,32)", adam2d)

def adam1d(k, b):
    p, g_, m, v = (b["f32"].reshape(-1), b["g32"].reshape(-1),
                   b["m32"].reshape(-1), b["v32"].reshape(-1))
    m = 0.9 * m + 0.1 * g_
    v = 0.999 * v + 0.001 * g_ * g_
    out = p - 0.01 * (m / 0.5) / (jnp.sqrt(v / 0.5) + 1e-8)
    return mix(k, out[:1] + m[:1] + v[:1])
chain("adam one leaf flat   ", adam1d)
