"""Micro: cost of the renderer's neighbor feature gather and its transpose
scatter-add at mapping scale (25k samples x 8 neighbors x 72 cols,
CAP=512k), f32 vs bf16 variants. Chained fori_loop + host readback
(axon block_until_ready does not wait)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

CAP = 1 << 19
N = 25_000
K = 8
W = 72
REP = 30

rng = np.random.default_rng(0)
packed = jnp.asarray(rng.standard_normal((CAP, W)), jnp.float32)
packed_bf = packed.astype(jnp.bfloat16)
idx = jnp.asarray(rng.integers(0, CAP, (N, K)), jnp.int32)
upd = jnp.asarray(rng.standard_normal((N, K, W)), jnp.float32)
upd_bf = upd.astype(jnp.bfloat16)


def chain(name, step, *args):
    @jax.jit
    def run(x0, args):
        def body(i, x):
            return step(x, args) * 1e-6 + x * 0.0 + i * 0.0
        return jax.lax.fori_loop(0, REP, body, x0)
    x0 = jnp.zeros((), jnp.float32)
    t0 = time.time()
    float(run(x0, args))
    ct = time.time() - t0
    t0 = time.time()
    float(run(x0, args))
    dt = (time.time() - t0) / REP
    print(f"{name}: {dt*1e3:7.3f} ms  (compile {ct:.0f}s)", flush=True)
    return dt


# gather only
chain("gather f32  (N,K,72)", lambda x, a: jnp.sum(a[0][a[1]] * (1 + x)),
      packed, idx)
chain("gather bf16 (N,K,72)",
      lambda x, a: jnp.sum((a[0][a[1]]).astype(jnp.float32) * (1 + x)),
      packed_bf, idx)

# scatter-add only (transpose of the gather): grad wrt packed of sum(packed[idx]*upd)
g_f32 = jax.grad(lambda p, i, u: jnp.sum(p[i] * u))
chain("scatter-add f32     ",
      lambda x, a: jnp.sum(g_f32(a[0], a[1], a[2])[:64] * (1 + x)),
      packed, idx, upd)

# scatter-add with bf16 updates into f32 target (cast first)
chain("scatter-add f32<-bf ",
      lambda x, a: jnp.sum(
          g_f32(a[0], a[1], a[2].astype(jnp.float32))[:64] * (1 + x)),
      packed, idx, upd_bf)

# fwd+bwd through gather + elementwise (closest to the render pattern)
def fwd(p, i, u):
    nb = p[i]
    w = jax.nn.softmax(jnp.sum(nb[..., :3] ** 2, -1), axis=-1)
    return jnp.sum(w[..., None] * nb * u)

gg = jax.grad(fwd)
chain("gather+ew fwd+bwd f32",
      lambda x, a: jnp.sum(gg(a[0], a[1], a[2])[:64] * (1 + x)),
      packed, idx, upd)
