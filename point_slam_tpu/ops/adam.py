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

import jax
import jax.numpy as jnp


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
