import numpy as np
import jax.numpy as jnp
import torch

from point_slam_tpu.common.compositing import raw2outputs


def torch_reference(raw, z_vals, rays_d, coef=0.1):
    """Port of the reference compositing formula (src/common.py:298-336) used
    purely as a numerical oracle for the test."""
    raw = torch.from_numpy(raw.copy())
    z_vals = torch.from_numpy(z_vals.copy())
    rays_d = torch.from_numpy(rays_d.copy())
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = torch.cat([dists, torch.full_like(dists[..., :1], 1e10)], -1)
    dists = dists * torch.norm(rays_d[..., None, :], dim=-1)
    rgb = raw[..., :-1]
    alpha = torch.sigmoid(coef * raw[..., -1])
    weights = alpha * torch.cumprod(
        torch.cat([torch.ones_like(alpha[..., :1]), 1. - alpha + 1e-10], -1),
        dim=-1)[:, :-1]
    wsum = weights.sum(-1, keepdim=True) + 1e-10
    rgb_map = (weights[..., None] * rgb).sum(-2) / wsum
    depth_map = (weights * z_vals).sum(-1) / wsum.squeeze(-1)
    tmp = z_vals - depth_map.unsqueeze(-1)
    depth_var = (weights * tmp * tmp).sum(-1)
    return (depth_map.numpy(), depth_var.numpy(), rgb_map.numpy(),
            weights.numpy())


def test_raw2outputs_matches_reference_formula():
    rng = np.random.default_rng(0)
    n, s = 64, 5
    raw = rng.normal(size=(n, s, 4)).astype(np.float32) * 10
    z = np.sort(rng.uniform(0.5, 4.0, size=(n, s)).astype(np.float32), axis=-1)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    ours = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d), coef=0.1)
    ref = torch_reference(raw, z, d, coef=0.1)
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(a), b, atol=2e-5, rtol=1e-4)


def test_occluded_sample_gets_no_weight():
    # a fully opaque first sample should dominate the composite
    raw = np.zeros((1, 5, 4), np.float32)
    raw[0, :, -1] = [1000.0, 1000.0, 0.0, 0.0, 0.0]
    raw[0, 0, :3] = [1.0, 0.0, 0.0]
    z = np.linspace(1.0, 2.0, 5, dtype=np.float32)[None]
    d = np.array([[0.0, 0.0, -1.0]], np.float32)
    depth, var, rgb, w = raw2outputs(jnp.asarray(raw), jnp.asarray(z),
                                     jnp.asarray(d), coef=0.1)
    assert abs(float(depth[0]) - 1.0) < 1e-2
    assert float(rgb[0, 0]) > 0.65
    assert float(var[0]) < 1e-2
