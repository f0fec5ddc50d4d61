"""Gather-VJP (scatter-add) cost: packed 72-wide vs two 32-wide."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

CAP = 1 << 19
Q = 125_000
K = 8
N = 20

rng = np.random.default_rng(0)
BIG = dict(
    f72=jnp.asarray(rng.standard_normal((CAP, 72)), jnp.float32),
    a32=jnp.asarray(rng.standard_normal((CAP, 32)), jnp.float32),
    b32=jnp.asarray(rng.standard_normal((CAP, 32)), jnp.float32),
    w=jnp.asarray(rng.standard_normal((Q, K)), jnp.float32),
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


def fwd72(src, i, w):
    nb = src[i]
    out = jnp.sum(w[..., None] * nb[..., :64], axis=1)
    return jnp.sum(out * out)


def fwd2x32(a, b, i, w):
    oa = jnp.sum(w[..., None] * a[i], axis=1)
    ob = jnp.sum(w[..., None] * b[i], axis=1)
    return jnp.sum(oa * oa) + jnp.sum(ob * ob)


def s_fwd72(k, b):
    return mix(k, fwd72(b["f72"], idxs(k), b["w"]))

def s_bwd72(k, b):
    g = jax.grad(fwd72)(b["f72"], idxs(k), b["w"])
    return mix(k, g[0])

def s_fwd2x32(k, b):
    return mix(k, fwd2x32(b["a32"], b["b32"], idxs(k), b["w"]))

def s_bwd2x32(k, b):
    ga, gb = jax.grad(fwd2x32, argnums=(0, 1))(b["a32"], b["b32"], idxs(k), b["w"])
    return mix(k, ga[0] + gb[0])


t1 = chain("fwd  packed 72   ", s_fwd72)
t2 = chain("fwd+bwd packed 72", s_bwd72)
t3 = chain("fwd  2x 32       ", s_fwd2x32)
t4 = chain("fwd+bwd 2x 32    ", s_bwd2x32)
print(f"\nbwd cost packed: {1e3*(t2-t1):.1f} ms | bwd cost 2x32: {1e3*(t4-t3):.1f} ms")
