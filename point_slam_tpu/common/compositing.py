"""Alpha compositing for depth-guided volumetric rendering (pure JAX).

Exact math parity with the reference compositing (src/common.py:298-336):
alpha = sigmoid(coef * occupancy); weights = alpha * cumprod(1 - alpha + 1e-10)
shifted; rgb/depth are *normalized* by the weight sum (+1e-10); the depth
variance (uncertainty) is NOT normalized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def raw2outputs(raw: jnp.ndarray, z_vals: jnp.ndarray, rays_d: jnp.ndarray,
                coef: float = 0.1):
    """Composite per-sample (r,g,b,occ) predictions along rays.

    Args:
        raw: (N_rays, N_samples, 4) — rgb + raw occupancy logits.
        z_vals: (N_rays, N_samples) sample depths along each ray.
        rays_d: (N_rays, 3) ray directions (used only for the distance scale
            term, kept for parity although weights don't depend on it here).
        coef: sigmoid sharpness on occupancy.

    Returns:
        depth (N,), depth_var (N,), rgb (N,3), weights (N, N_samples).
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1)
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    rgb = raw[..., :-1]
    alpha = jax.nn.sigmoid(coef * raw[..., -1]) if coef is not None else raw[..., -1]

    shifted = jnp.concatenate(
        [jnp.ones_like(alpha[..., :1]), (1.0 - alpha + 1e-10)], axis=-1)
    weights = alpha * jnp.cumprod(shifted, axis=-1)[..., :-1]

    weights_sum = jnp.sum(weights, axis=-1, keepdims=True) + 1e-10
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2) / weights_sum
    depth_map = jnp.sum(weights * z_vals, axis=-1) / weights_sum[..., 0]

    tmp = z_vals - depth_map[..., None]
    depth_var = jnp.sum(weights * tmp * tmp, axis=-1)
    return depth_map, depth_var, rgb_map, weights
