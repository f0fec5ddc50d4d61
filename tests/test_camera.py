import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from point_slam_tpu.common import camera


def random_rotations(n, seed=0):
    rng = np.random.default_rng(seed)
    return Rotation.random(n, random_state=rng).as_matrix()


def test_quat_to_rotation_matches_scipy():
    rng = np.random.default_rng(1)
    q_xyzw = Rotation.random(64, random_state=rng).as_quat()
    q_wxyz = np.roll(q_xyzw, 1, axis=1)
    ours = np.asarray(camera.quat_to_rotation(jnp.asarray(q_wxyz)))
    ref = Rotation.from_quat(q_xyzw).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_quat_to_rotation_scale_invariant():
    q = np.array([[0.5, 0.1, -0.3, 0.8]])
    r1 = np.asarray(camera.quat_to_rotation(jnp.asarray(q)))
    r2 = np.asarray(camera.quat_to_rotation(jnp.asarray(3.7 * q)))
    np.testing.assert_allclose(r1, r2, atol=1e-6)


def test_rotation_to_quat_matches_scipy_branch():
    for i, rot in enumerate(random_rotations(200, seed=2)):
        ours = camera.rotation_to_quat_np(rot)
        ref = Rotation.from_matrix(rot).as_quat()
        np.testing.assert_allclose(ours, ref, atol=1e-9,
                                   err_msg=f"rotation {i} mismatch (incl. sign)")


def test_pose_tensor_roundtrip():
    for rot in random_rotations(32, seed=3):
        rt = np.eye(4)
        rt[:3, :3] = rot
        rt[:3, 3] = np.random.default_rng(0).normal(size=3)
        t = camera.tensor_from_pose_matrix(rt)
        rt2 = np.asarray(camera.pose_matrix_from_tensor(jnp.asarray(t)))
        np.testing.assert_allclose(rt2, rt[:3, :4], atol=1e-5)


def test_rays_reference_convention():
    # pixel at the principal point looks along -z of the camera frame
    fx = fy = 100.0
    cx, cy = 32.0, 24.0
    c2w = jnp.eye(4)
    o, d = camera.rays_from_uv(jnp.array([cx]), jnp.array([cy]), c2w, fx, fy, cx, cy)
    np.testing.assert_allclose(np.asarray(d), [[0, 0, -1]], atol=1e-7)
    # +u direction maps to +x (right), +v to -y (down in image = -y in cam)
    o, d = camera.rays_from_uv(jnp.array([cx + fx]), jnp.array([cy + fy]), c2w,
                               fx, fy, cx, cy)
    np.testing.assert_allclose(np.asarray(d), [[1, -1, -1]], atol=1e-6)


def test_rays_full_image_matches_uv():
    H, W = 6, 9
    fx, fy, cx, cy = 40.0, 42.0, 4.0, 2.5
    rng = np.random.default_rng(4)
    rot = random_rotations(1, seed=5)[0]
    c2w = np.eye(4)
    c2w[:3, :3] = rot
    c2w[:3, 3] = rng.normal(size=3)
    c2w = jnp.asarray(c2w, dtype=jnp.float32)
    o_img, d_img = camera.rays_full_image(H, W, fx, fy, cx, cy, c2w)
    jj, ii = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    o_uv, d_uv = camera.rays_from_uv(jnp.asarray(ii.ravel(), jnp.float32),
                                     jnp.asarray(jj.ravel(), jnp.float32),
                                     c2w, fx, fy, cx, cy)
    np.testing.assert_allclose(np.asarray(d_img).reshape(-1, 3), np.asarray(d_uv),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_img).reshape(-1, 3), np.asarray(o_uv),
                               atol=1e-6)


def test_project_points_roundtrip():
    # a point along a pixel ray projects back to that pixel with negative z
    fx, fy, cx, cy = 60.0, 61.0, 30.0, 20.0
    rot = random_rotations(1, seed=7)[0]
    c2w = np.eye(4)
    c2w[:3, :3] = rot
    c2w[:3, 3] = [0.3, -0.2, 1.0]
    i = jnp.array([11.0, 40.0, 25.0])
    j = jnp.array([5.0, 30.0, 14.0])
    o, d = camera.rays_from_uv(i, j, jnp.asarray(c2w, jnp.float32), fx, fy, cx, cy)
    pts = o + 2.5 * d
    w2c = jnp.asarray(np.linalg.inv(c2w), jnp.float32)
    u, v, z = camera.project_points(pts, w2c, fx, fy, cx, cy)
    np.testing.assert_allclose(np.asarray(u), np.asarray(i), atol=1e-3)
    np.testing.assert_allclose(np.asarray(v), np.asarray(j), atol=1e-3)
    assert np.all(np.asarray(z) < 0)
