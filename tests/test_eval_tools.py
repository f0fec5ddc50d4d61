import numpy as np
import jax.numpy as jnp

from point_slam_tpu.tools.eval_ate import evaluate_ate, horn_align
from point_slam_tpu.utils import metrics


def random_traj(n=50, seed=0):
    rng = np.random.default_rng(seed)
    poses = []
    p = np.eye(4)
    for _ in range(n):
        p = p.copy()
        p[:3, 3] += rng.normal(scale=0.05, size=3)
        poses.append(p.copy())
    return np.stack(poses)


def rigid_transform(poses, seed=1):
    from scipy.spatial.transform import Rotation
    rng = np.random.default_rng(seed)
    rot = Rotation.random(random_state=rng).as_matrix()
    t = rng.normal(size=3)
    tf = np.eye(4)
    tf[:3, :3] = rot
    tf[:3, 3] = t
    return np.einsum("ij,njk->nik", tf, poses)


def test_ate_zero_for_identical():
    gt = random_traj()
    r = evaluate_ate(gt, gt)
    assert r["absolute_translational_error.rmse"] < 1e-12
    assert r["compared_pose_pairs"] == 50


def test_ate_alignment_removes_rigid_offset():
    gt = random_traj()
    est = rigid_transform(gt)
    aligned = evaluate_ate(gt, est, align=True)
    unaligned = evaluate_ate(gt, est, align=False)
    assert aligned["absolute_translational_error.rmse"] < 1e-9
    assert unaligned["absolute_translational_error.rmse"] > 0.1


def test_ate_detects_noise():
    gt = random_traj()
    est = gt.copy()
    est[:, :3, 3] += np.random.default_rng(2).normal(scale=0.01, size=(50, 3))
    r = evaluate_ate(gt, est)
    assert 0.005 < r["absolute_translational_error.rmse"] < 0.05


def test_ate_skips_invalid_poses():
    gt = random_traj()
    gt[3] = np.inf
    r = evaluate_ate(gt, gt)
    assert r["compared_pose_pairs"] == 49


def test_horn_reflection_guard():
    # degenerate planar data must still return a proper rotation (det +1)
    model = np.random.default_rng(3).normal(size=(3, 30))
    model[2] = 0
    rot, trans, err = horn_align(model, model)
    assert np.isclose(np.linalg.det(rot), 1.0, atol=1e-6)


def test_psnr():
    rng = np.random.default_rng(0)
    a = rng.random((32, 32, 3)).astype(np.float32)
    noise = a + 0.1 * rng.standard_normal((32, 32, 3)).astype(np.float32)
    p = metrics.psnr(jnp.asarray(noise), jnp.asarray(a))
    assert 15 < p < 25  # sigma 0.1 -> ~20 dB


def test_ms_ssim_bounds():
    rng = np.random.default_rng(1)
    a = rng.random((192, 192, 3)).astype(np.float32)
    same = metrics.ms_ssim(jnp.asarray(a), jnp.asarray(a))
    assert abs(same - 1.0) < 1e-4
    noisy = np.clip(a + 0.3 * rng.standard_normal(a.shape), 0, 1).astype(np.float32)
    worse = metrics.ms_ssim(jnp.asarray(noisy), jnp.asarray(a))
    assert worse < same - 0.05


def test_ms_ssim_smooth_vs_structured():
    # structural distortion hurts more than small uniform brightness shift
    x = np.tile(np.linspace(0, 1, 192)[None, :, None], (192, 1, 3)).astype(np.float32)
    bright = np.clip(x + 0.02, 0, 1)
    shuffled = x.copy().reshape(-1, 3)
    np.random.default_rng(2).shuffle(shuffled)
    shuffled = shuffled.reshape(x.shape)
    assert metrics.ms_ssim(jnp.asarray(bright), jnp.asarray(x)) > \
        metrics.ms_ssim(jnp.asarray(shuffled), jnp.asarray(x))


def test_plot_traj_writes_png(tmp_path):
    from point_slam_tpu.tools.eval_ate import plot_traj
    n = 12
    gt = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
    gt[:, 0, 3] = np.linspace(0, 1, n)
    est = gt.copy()
    est[:, 1, 3] += 0.01
    out = tmp_path / "traj.png"
    plot_traj(gt, est, str(out))
    assert out.exists() and out.stat().st_size > 1000


def test_lpips_jax_forward(tmp_path, monkeypatch):
    """Pure-JAX LPIPS activates from a weights npz: zero on identical images,
    positive on different ones (random but correctly-shaped weights)."""
    import numpy as np
    from point_slam_tpu.utils import metrics

    rng = np.random.default_rng(0)
    shapes = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
              (256, 384, 3, 3), (256, 256, 3, 3)]
    w = {"shift": np.array([-0.030, -0.088, -0.188], np.float32),
         "scale": np.array([0.458, 0.448, 0.450], np.float32)}
    for i, s in enumerate(shapes):
        w[f"conv{i}_w"] = (0.1 * rng.standard_normal(s)).astype(np.float32)
        w[f"conv{i}_b"] = np.zeros(s[0], np.float32)
        w[f"lin{i}_w"] = rng.uniform(0, 1, s[0]).astype(np.float32)
    path = tmp_path / "lpips_alex.npz"
    np.savez(path, **w)
    monkeypatch.setenv(metrics.LPIPS_NPZ_ENV, str(path))
    metrics._LPIPS_CACHE.clear()

    img = rng.uniform(0, 1, (96, 128, 3)).astype(np.float32)
    ref = np.clip(img + 0.1 * rng.standard_normal(img.shape), 0, 1
                  ).astype(np.float32)
    same = metrics.lpips(img, img)
    diff = metrics.lpips(img, ref)
    metrics._LPIPS_CACHE.clear()
    assert same is not None and abs(same) < 1e-6
    assert diff is not None and diff > 1e-4
