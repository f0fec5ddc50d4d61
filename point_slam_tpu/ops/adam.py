"""Minimal Adam with per-group traced learning rates, torch-semantics.

The reference re-creates torch.optim.Adam per frame and rewrites group LRs
every iteration (src/Mapper.py:394-432, src/Tracker.py:323). Here the whole
per-frame loop is one XLA while_loop, so the optimizer is three pure
functions over pytrees with the LR as a traced scalar. Update formula matches
torch.optim.Adam defaults (b1=0.9, b2=0.999, eps=1e-8, bias correction).

Gradient masking: a leaf whose gradient is forced to zero for its entire
lifetime accumulates zero moments and receives an exactly-zero update —
equivalent to the reference's leaf-subset optimizers (frustum feature
selection, src/Mapper.py:342-356).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def init_state(params):
    zeros = lambda p: jnp.zeros_like(p)
    return {"m": jax.tree_util.tree_map(zeros, params),
            "v": jax.tree_util.tree_map(zeros, params)}


def update(params, grads, state, t, lr, b1=0.9, b2=0.999, eps=1e-8):
    """One Adam step. ``t`` is the 1-based step count (traced), ``lr`` traced.

    Returns (new_params, new_state).
    """
    t = t.astype(jnp.float32) if hasattr(t, "astype") else jnp.float32(t)
    c1 = 1.0 - b1 ** t
    c2 = 1.0 - b2 ** t

    def upd(p, g, m, v):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mhat = m / c1
        vhat = v / c2
        return p - lr * mhat / (jnp.sqrt(vhat) + eps), m, v

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state["m"])
    flat_v = treedef.flatten_up_to(state["v"])
    out = [upd(p, g, m, v) for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v)]
    new_p = treedef.unflatten([o[0] for o in out])
    new_m = treedef.unflatten([o[1] for o in out])
    new_v = treedef.unflatten([o[2] for o in out])
    return new_p, {"m": new_m, "v": new_v}


# ------------------------------------------------- fused packed-buffer Adam

def _row_adam_kernel(b1, b2, eps):
    def kernel(p_ref, g_ref, m_ref, v_ref, mask_ref, c1_ref, c2_ref, lr_ref,
               po_ref, mo_ref, vo_ref):
        g = g_ref[...] * mask_ref[...]          # frustum gradient mask
        m = b1 * m_ref[...] + (1 - b1) * g
        v = b2 * v_ref[...] + (1 - b2) * g * g
        mhat = m / c1_ref[...]
        vhat = v / c2_ref[...]
        po_ref[...] = p_ref[...] - lr_ref[...] * mhat / (jnp.sqrt(vhat) + eps)
        mo_ref[...] = m
        vo_ref[...] = v
    return kernel


@functools.partial(jax.jit, static_argnames=("b1", "b2", "eps"))
def update_rows(params, grads, state, t_row, lr_row, row_mask,
                b1=0.9, b2=0.999, eps=1e-8):
    """Adam over one big (N, W) leaf with per-COLUMN step counts / LRs and a
    per-ROW gradient mask, fused into a single Pallas pass.

    Same formula as ``update(params, grads * row_mask[:, None], state,
    t_row, lr_row)``; results agree to ~1 ulp (XLA contracts a*x+b*y into
    FMA, the kernel may not — measured max 1-ulp drift on the moments).
    The fusion saves the separate mask-multiply pass and XLA's extra HBM
    sweeps over the 7 full-buffer arrays (the mapping loop's Adam is
    bandwidth-bound at ~2 ms/iter on a 512k x 72 buffer).

    Args:
        params/grads: (N, W) f32. state: {"m","v"} of (N, W).
        t_row:  (W,) per-column 1-based step counts (traced f32).
        lr_row: (W,) per-column learning rates.
        row_mask: (N,) 0/1 f32 gradient mask.
    """
    n, w = params.shape
    c1 = (1.0 - b1 ** t_row).astype(jnp.float32).reshape(1, w)
    c2 = (1.0 - b2 ** t_row).astype(jnp.float32).reshape(1, w)
    lr = jnp.broadcast_to(jnp.asarray(lr_row, jnp.float32), (w,)).reshape(1, w)

    blk = 512
    while n % blk:
        blk //= 2
    bs = pl.BlockSpec((blk, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    bs_m = pl.BlockSpec((blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    bs_r = pl.BlockSpec((1, w), lambda i: (0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((n, w), jnp.float32)
    p, m, v = pl.pallas_call(
        _row_adam_kernel(b1, b2, eps),
        grid=(n // blk,),
        in_specs=[bs, bs, bs, bs, bs_m, bs_r, bs_r, bs_r],
        out_specs=[bs, bs, bs],
        out_shape=[shape, shape, shape],
        interpret=jax.default_backend() == "cpu",
    )(params, grads, state["m"], state["v"],
      row_mask.astype(jnp.float32).reshape(n, 1), c1, c2, lr)
    return p, {"m": m, "v": v}
