"""Image-metric tests.

LPIPS: the pure-JAX AlexNet-LPIPS forward (utils/metrics.py) cannot be
exercised against real weights in this environment (no egress, no
torchvision model zoo), so prove the forward itself: random-but-fixed
weights with the AlexNet-LPIPS wiring (strides/pads/pools/taps/linear
heads) evaluated by an independent torch re-implementation must match.
With that proven, correctness with real weights reduces to the converter
(tools/convert_lpips.py) emitting the right tensors.
"""
import os

import numpy as np
import pytest

from point_slam_tpu.utils import metrics as M


def _synth_lpips_params(rng, ch=(16, 24, 32, 32, 32)):
    """Random weights with real AlexNet-LPIPS topology, reduced channels."""
    p = {
        "shift": np.array([-0.030, -0.088, -0.188], np.float32),
        "scale": np.array([0.458, 0.448, 0.450], np.float32),
    }
    specs = [  # (out_ch, in_ch, k)
        (ch[0], 3, 11), (ch[1], ch[0], 5), (ch[2], ch[1], 3),
        (ch[3], ch[2], 3), (ch[4], ch[3], 3)]
    for i, (o, c, k) in enumerate(specs):
        p[f"conv{i}_w"] = rng.normal(0, 0.15, (o, c, k, k)).astype(np.float32)
        p[f"conv{i}_b"] = rng.normal(0, 0.05, (o,)).astype(np.float32)
        p[f"lin{i}_w"] = rng.uniform(0, 0.1, (ch[i],)).astype(np.float32)
    return p


def _torch_lpips(img_a, img_b, p):
    """Independent torch re-implementation of AlexNet-LPIPS
    (richzhang/PerceptualSimilarity LPIPS(net='alex') semantics)."""
    import torch
    import torch.nn.functional as F

    def conv(x, i, stride=1, pad=0):
        return F.conv2d(x, torch.from_numpy(p[f"conv{i}_w"]),
                        torch.from_numpy(p[f"conv{i}_b"]),
                        stride=stride, padding=pad)

    shift = torch.from_numpy(p["shift"]).reshape(1, 3, 1, 1)
    scale = torch.from_numpy(p["scale"]).reshape(1, 3, 1, 1)

    def feats(img):
        x = torch.from_numpy(img).permute(2, 0, 1)[None].float()
        x = (2.0 * x - 1.0 - shift) / scale
        taps = []
        x = F.relu(conv(x, 0, stride=4, pad=2)); taps.append(x)
        x = F.relu(conv(F.max_pool2d(x, 3, 2), 1, pad=2)); taps.append(x)
        x = F.relu(conv(F.max_pool2d(x, 3, 2), 2, pad=1)); taps.append(x)
        x = F.relu(conv(x, 3, pad=1)); taps.append(x)
        x = F.relu(conv(x, 4, pad=1)); taps.append(x)
        return taps

    fa, fb = feats(img_a), feats(img_b)
    total = 0.0
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        na = xa / torch.sqrt((xa * xa).sum(1, keepdim=True) + 1e-10)
        nb = xb / torch.sqrt((xb * xb).sum(1, keepdim=True) + 1e-10)
        d2 = (na - nb) ** 2
        lin = torch.from_numpy(p[f"lin{i}_w"]).reshape(1, -1, 1, 1)
        total = total + (d2 * lin).sum(1).mean()
    return float(total)


def test_lpips_forward_torch_parity():
    torch = pytest.importorskip("torch")  # noqa: F841
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    p = _synth_lpips_params(rng)
    a = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)

    jp = {k: jnp.asarray(v) for k, v in p.items()}
    ja = jnp.transpose(jnp.asarray(a), (2, 0, 1))[None]
    jb = jnp.transpose(jnp.asarray(b), (2, 0, 1))[None]
    got = float(M._lpips_jit(ja, jb, jp))
    want = _torch_lpips(a, b, p)
    assert got == pytest.approx(want, rel=1e-4)
    # sanity: identical images give ~0
    assert float(M._lpips_jit(ja, ja, jp)) == pytest.approx(0.0, abs=1e-6)


def test_lpips_npz_roundtrip(tmp_path, monkeypatch):
    """lpips() picks up a weights npz via POINT_SLAM_LPIPS_NPZ and returns a
    finite value; without weights it returns None (metric optional)."""
    rng = np.random.default_rng(3)
    p = _synth_lpips_params(rng)
    path = tmp_path / "lpips.npz"
    np.savez(path, **p)

    a = rng.uniform(0, 1, (48, 48, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (48, 48, 3)).astype(np.float32)

    monkeypatch.setitem(M._LPIPS_CACHE, "params", None)
    M._LPIPS_CACHE.pop("params")
    monkeypatch.setenv(M.LPIPS_NPZ_ENV, str(path))
    try:
        val = M.lpips(a, b)
        assert val is not None and np.isfinite(val) and val > 0
    finally:
        M._LPIPS_CACHE.pop("params", None)


def test_psnr_and_ms_ssim_basics():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (192, 192, 3)).astype(np.float32)
    assert M.psnr(a, a) > 80
    assert M.ms_ssim(a, a) == pytest.approx(1.0, abs=1e-4)
    noisy = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    assert M.ms_ssim(a, noisy) < 0.999


def test_ms_ssim_small_image_drops_scales():
    # below 176 px the 5-scale pyramid would hit an empty VALID window
    # (NaN); scales are dropped and weights renormalized instead
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (120, 160, 3)).astype(np.float32)
    noisy = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    same = M.ms_ssim(a, a)
    worse = M.ms_ssim(a, noisy)
    assert np.isfinite(same) and np.isfinite(worse)
    assert same == pytest.approx(1.0, abs=1e-4)
    assert worse < same


def test_ms_ssim_tiny_image_raises():
    # min side < 11 cannot support a single 11-px VALID window
    a = np.zeros((8, 160, 3), np.float32)
    with pytest.raises(ValueError):
        M.ms_ssim(a, a)
