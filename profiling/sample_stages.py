"""Ray-sampling rung split (round 5): where does ~1 ms/iter go?

The r3 ladder's `sample` rung costs ~1.06 ms/iter against a ~0.02 ms
stream bound. Candidates: the per-iteration EXACT median of the 5000-ray
depth batch (torch.median parity, src/Mapper.py:507-509 — computed via a
full jnp.sort today), the three (F,H,W,*) window pixel gathers, or misc
small ops. This micro times, at bench shapes (12-frame 680x1200 window,
5000 rays):

  s1 full       _sample_window_rays as shipped
  s2 nomedian   same but median/max filter replaced by a constant
  s3 sortmed    masked_median_sort (full-sort median) alone
  s4 radixsel   the SHIPPED masked_median (32-step radix-select)

If (s1 - s2) ~ s3 and s4 << s3, swapping masked_median's sort for the
radix-select is an exact-semantics win.

Run on TPU: python profiling/sample_stages.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from point_slam_tpu.common import image
from point_slam_tpu import mapper as M

F, H, W = 12, 680, 1200
R = 5000
N = 30

rng = np.random.default_rng(0)
window = dict(
    color=jnp.asarray(rng.uniform(0, 1, (F, H, W, 3)), jnp.float32),
    depth=jnp.asarray(rng.uniform(0.5, 6, (F, H, W)), jnp.float32),
    r_query=jnp.asarray(rng.uniform(0.02, 0.16, (F, H, W)), jnp.float32))


class MS:  # minimal MapperStatic stand-in for _sample_window_rays
    r_max = R
    f_max = F
    h, w = H, W
    fx = fy = 600.0
    cx, cy = 599.5, 339.5
    dp = 1


BIG = dict(window=window,
           depths=jnp.asarray(rng.uniform(0.5, 6, (R,)), jnp.float32))
jax.block_until_ready(jax.tree_util.tree_leaves(BIG))


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
    print(f"{name}: {dt * 1e3:7.2f} ms/iter (compile {ct:.0f}s)", flush=True)
    return dt


def mix(k, *xs):
    s = sum((jnp.sum(x) * 0.0).astype(jnp.int32) for x in xs)
    return jax.random.fold_in(k, s + 1)


def s_full(k, b):
    rays = M._sample_window_rays(MS, k, b["window"], jnp.int32(F),
                                 jnp.int32(R // F))
    return mix(k, rays["gt_depth"], rays["gt_color"], rays["ray_ok"])


def s_nomedian(k, b):
    # _sample_window_rays with the median/max inside-filter disabled
    ms = MS
    rmax = ms.r_max
    slot = jnp.arange(rmax) // jnp.maximum(R // F, 1)
    ray_ok = slot < F
    slot = jnp.minimum(slot, ms.f_max - 1)
    ki, kj = jax.random.split(k)
    i = jax.random.randint(ki, (rmax,), 0, ms.w).astype(jnp.int32)
    j = jax.random.randint(kj, (rmax,), 0, ms.h).astype(jnp.int32)
    col = b["window"]["color"][slot, j, i]
    dep = b["window"]["depth"][slot, j, i]
    rq = b["window"]["r_query"][slot, j, i]
    ray_ok &= dep > 0
    ray_ok &= dep <= 60.0  # constant stand-in for the median/max filter
    return mix(k, dep, col, rq, ray_ok)


def s_sort5k(k, b):
    d = b["depths"] + jax.random.normal(k, (R,)) * 1e-3
    return mix(k, image.masked_median_sort(d, d > 0))


def radix_select_median(x, mask):
    """EXACT masked median (torch lower-middle semantics) without a sort:
    32-step bitwise radix descent over the monotonic f32<->int order
    embedding. Works for any finite f32 values incl. negatives."""
    big = jnp.asarray(jnp.inf, x.dtype)
    v = jnp.where(mask, x, big)
    b = jax.lax.bitcast_convert_type(v, jnp.int32)
    # monotonic order embedding: flip sign bit for >=0, all bits for <0
    u = jnp.where(b < 0, ~b, b | jnp.int32(-2147483648)).astype(jnp.uint32)
    n = jnp.sum(mask)
    target = jnp.maximum(n - 1, 0) // 2  # k-th smallest, 0-based

    # count per step: elements matching prefix with current bit 0
    def body2(i, carry):
        prefix, k_rem = carry
        shift = 31 - i
        bit = jnp.uint32(1) << shift
        hi = u >> shift
        zeros = jnp.sum(hi == (prefix >> shift)).astype(jnp.uint32)
        go_high = k_rem >= zeros
        new_prefix = jnp.where(go_high, prefix | bit, prefix)
        return (new_prefix, jnp.where(go_high, k_rem - zeros, k_rem))

    prefix0 = jnp.uint32(0)
    prefix, _ = jax.lax.fori_loop(
        0, 32, body2, (prefix0, target.astype(jnp.uint32)))
    ub = prefix.astype(jnp.uint32)
    bi = jnp.where((ub & jnp.uint32(0x80000000)) != 0,
                   (ub & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32),
                   ~ub.astype(jnp.int32))
    val = jax.lax.bitcast_convert_type(bi.astype(jnp.int32), jnp.float32)
    return jnp.where(n > 0, val, big)


def s_radixsel(k, b):
    d = b["depths"] + jax.random.normal(k, (R,)) * 1e-3
    m = d > 0
    return mix(k, image.masked_median(d, m))


# correctness check of the radix-select vs the shipped sort-median
_k = jax.random.key(1)
for trial in range(20):
    _k, sk = jax.random.split(_k)
    d = jax.random.uniform(sk, (R,), minval=0.0, maxval=8.0)
    m = d > jax.random.uniform(sk, (R,))
    a = image.masked_median_sort(d, m)
    bsel = image.masked_median(d, m)
    assert (np.isinf(float(a)) and np.isinf(float(bsel))) or \
        float(a) == float(bsel), (trial, float(a), float(bsel))
print("radix_select_median == masked_median on 20 random trials", flush=True)

t1 = chain("s1 full sample       ", s_full)
t2 = chain("s2 no median/max     ", s_nomedian)
t3 = chain("s3 sort 5k           ", s_sort5k)
t4 = chain("s4 radix-select      ", s_radixsel)
print(f"-> median+max share {(t1 - t2) * 1e3:.2f} ms | sort alone "
      f"{t3 * 1e3:.2f} | radix-select alone {t4 * 1e3:.2f}", flush=True)
