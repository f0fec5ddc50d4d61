"""Pixel/ray sampling for the optimization loops (pure JAX, static shapes).

Parity with src/common.py:59-222: uniform pixel sampling with replacement
inside an edge-cropped region, and color-gradient-ranked selection. Instead of
boolean filtering (dynamic shapes), every sampler returns fixed-size batches
plus validity masks; downstream losses are masked sums, which is exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_pixels_uniform(key, h0: int, h1, w0: int, w1, n: int):
    """n pixel coords (i=cols float, j=rows float) uniform w/ replacement from
    the region [h0,h1) x [w0,w1) (src/common.py:59-89). h1/w1 may be traced."""
    ki, kj = jax.random.split(key)
    i = jax.random.randint(ki, (n,), w0, w1).astype(jnp.float32)
    j = jax.random.randint(kj, (n,), h0, h1).astype(jnp.float32)
    return i, j


def gather_pixels(img: jnp.ndarray, i: jnp.ndarray, j: jnp.ndarray):
    """img (H,W,...) values at integer pixel coords (i=cols, j=rows)."""
    return img[j.astype(jnp.int32), i.astype(jnp.int32)]


def top_gradient_candidates(grad_mag: jnp.ndarray, h0: int, h1: int,
                            w0: int, w1: int, n_top: int,
                            depth: jnp.ndarray | None = None,
                            depth_limit: float | None = None):
    """Flat indices of the globally top-n_top gradient pixels, with a mask for
    those inside the region (and depth-valid).

    Parity: src/common.py:117-159 — the top-k is taken over the whole image,
    then restricted to the region; per-iteration subsampling happens later.
    Returns (flat_idx (n_top,), valid (n_top,)).
    """
    h, w = grad_mag.shape
    flat = grad_mag.reshape(-1)
    _, idx = jax.lax.top_k(flat, n_top)
    jj = idx // w
    ii = idx % w
    valid = (jj >= h0) & (jj < h1) & (ii >= w0) & (ii < w1)
    if depth is not None:
        dvals = depth.reshape(-1)[idx]
        if depth_limit is not None:
            valid &= (dvals <= depth_limit) & (dvals > 0)
        else:
            valid &= dvals > 0
    return idx, valid


def choose_without_replacement(key, valid: jnp.ndarray, n: int):
    """Pick n distinct positions among the valid entries, uniformly.

    Static-shape equivalent of np.random.choice(m, n, replace=False) over the
    valid subset: random keys, invalid -> -inf, take top-n. Returns
    (positions (n,), ok (n,)) — ok False when fewer than n valid entries.
    """
    scores = jax.random.uniform(key, valid.shape)
    scores = jnp.where(valid, scores, -jnp.inf)
    _, pos = jax.lax.top_k(scores, n)
    ok = valid[pos]
    return pos, ok


def flat_to_ij(flat_idx: jnp.ndarray, w: int):
    """Flat image index -> (i cols float, j rows float)."""
    return ((flat_idx % w).astype(jnp.float32),
            (flat_idx // w).astype(jnp.float32))
