"""Camera model, ray generation and quaternion/pose math (pure JAX + numpy host).

Convention parity with the reference (src/common.py:40-56,225-295): camera
space is x right, y up, z backwards (OpenGL-style); pixel (i, j) maps to the
camera-space direction [(i-cx)/fx, -(j-cy)/fy, -1], rotated by c2w[:3,:3].
Quaternions are stored (w, x, y, z); `quat_to_rotation` normalizes via
2/|q|^2 so it is scale-invariant and differentiable through unnormalized
quaternions (needed by the tracker's pose optimization).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def intrinsics_matrix(fx, fy, cx, cy) -> np.ndarray:
    K = np.eye(3)
    K[0, 0] = fx
    K[1, 1] = fy
    K[0, 2] = cx
    K[1, 2] = cy
    return K


def ray_dirs_cam(i: jnp.ndarray, j: jnp.ndarray, fx, fy, cx, cy) -> jnp.ndarray:
    """Camera-space ray directions for pixel columns i, rows j. Shape (..., 3)."""
    return jnp.stack([(i - cx) / fx, -(j - cy) / fy, -jnp.ones_like(i)], axis=-1)


def rays_from_uv(i, j, c2w, fx, fy, cx, cy):
    """World-space rays for flattened pixel coords. Differentiable in c2w.

    Returns (rays_o (N,3), rays_d (N,3)). rays_d = R @ dir_cam (not normalized),
    matching src/common.py:40-56.
    """
    dirs = ray_dirs_cam(i.astype(jnp.float32), j.astype(jnp.float32), fx, fy, cx, cy)
    rays_d = dirs @ c2w[:3, :3].T
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def rays_full_image(H: int, W: int, fx, fy, cx, cy, c2w):
    """Rays for every pixel of an image. Returns ((H,W,3), (H,W,3))."""
    jj, ii = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    dirs = ray_dirs_cam(ii, jj, fx, fy, cx, cy)
    rays_d = dirs @ c2w[:3, :3].T
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def quat_to_rotation(quad: jnp.ndarray) -> jnp.ndarray:
    """Batched (w,x,y,z) quaternion -> rotation matrix, scale-invariant.

    Matches src/common.py:225-248 (two_s = 2/|q|^2 normalization), so the
    gradient flows through unnormalized quaternions during tracking.
    """
    quad = jnp.atleast_2d(quad)
    qr, qi, qj, qk = quad[:, 0], quad[:, 1], quad[:, 2], quad[:, 3]
    two_s = 2.0 / jnp.sum(quad * quad, axis=-1)
    r00 = 1 - two_s * (qj ** 2 + qk ** 2)
    r01 = two_s * (qi * qj - qk * qr)
    r02 = two_s * (qi * qk + qj * qr)
    r10 = two_s * (qi * qj + qk * qr)
    r11 = 1 - two_s * (qi ** 2 + qk ** 2)
    r12 = two_s * (qj * qk - qi * qr)
    r20 = two_s * (qi * qk - qj * qr)
    r21 = two_s * (qj * qk + qi * qr)
    r22 = 1 - two_s * (qi ** 2 + qj ** 2)
    rot = jnp.stack([
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ], axis=-2)
    return rot


def pose_matrix_from_tensor(inputs: jnp.ndarray) -> jnp.ndarray:
    """(w,x,y,z,tx,ty,tz) camera tensor -> 3x4 (or N,3,4) pose matrix.

    Parity: src/common.py:251-267.
    """
    single = inputs.ndim == 1
    inputs = jnp.atleast_2d(inputs)
    quad, t = inputs[:, :4], inputs[:, 4:]
    rot = quat_to_rotation(quad)
    rt = jnp.concatenate([rot, t[:, :, None]], axis=2)
    return rt[0] if single else rt


def pose_matrix_from_tensor_np(cam: np.ndarray) -> np.ndarray:
    """(w,x,y,z,tx,ty,tz) -> 4x4 pose matrix, host-side."""
    rt = np.asarray(pose_matrix_from_tensor(jnp.asarray(cam)))
    out = np.eye(4, dtype=np.float32)
    out[:3, :4] = rt
    return out


def rotation_to_quat_np(rot: np.ndarray) -> np.ndarray:
    """Single rotation matrix -> (x,y,z,w) quaternion, scipy-compatible branch.

    Mirrors scipy.spatial.transform.Rotation.from_matrix().as_quat() so pose
    initialization follows the reference bit-for-branch (src/common.py:270-295).
    """
    m = np.asarray(rot, dtype=np.float64)
    decision = np.array([m[0, 0], m[1, 1], m[2, 2], m[0, 0] + m[1, 1] + m[2, 2]])
    choice = int(np.argmax(decision))
    q = np.empty(4)
    if choice != 3:
        i = choice
        j = (i + 1) % 3
        k = (j + 1) % 3
        q[i] = 1 - decision[3] + 2 * m[i, i]
        q[j] = m[j, i] + m[i, j]
        q[k] = m[k, i] + m[i, k]
        q[3] = m[k, j] - m[j, k]
    else:
        q[0] = m[2, 1] - m[1, 2]
        q[1] = m[0, 2] - m[2, 0]
        q[2] = m[1, 0] - m[0, 1]
        q[3] = 1 + decision[3]
    return q / np.linalg.norm(q)


def tensor_from_pose_matrix(rt: np.ndarray, t_first: bool = False) -> np.ndarray:
    """3x4/4x4 pose -> 7-vector (w,x,y,z,tx,ty,tz) (or t-first). Host-side.

    Parity: src/common.py:270-295 (scipy xyzw rolled to wxyz).
    """
    rt = np.asarray(rt)
    r, t = rt[:3, :3], rt[:3, 3]
    quad = np.roll(rotation_to_quat_np(r), 1)  # xyzw -> wxyz
    if t_first:
        return np.concatenate([t, quad], 0).astype(np.float32)
    return np.concatenate([quad, t], 0).astype(np.float32)


def pose_4x4(rt: jnp.ndarray) -> jnp.ndarray:
    """Append the homogeneous bottom row to a 3x4 pose."""
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=rt.dtype)
    return jnp.concatenate([rt, bottom], axis=0)


def project_points(points: jnp.ndarray, w2c: jnp.ndarray, fx, fy, cx, cy):
    """Project world points into a camera; returns (u, v, z_cam).

    The x-axis is flipped before applying K so that u runs left->right,
    matching the reference's frustum/overlap projections (src/Mapper.py:140-147,
    211-219). z_cam is negative in front of the camera.
    """
    ones = jnp.ones_like(points[:, :1])
    cam = (jnp.concatenate([points, ones], axis=1) @ w2c.T)[:, :3]
    x = -cam[:, 0]
    y = cam[:, 1]
    z_raw = cam[:, 2]
    z = z_raw + 1e-5
    u = (fx * x + cx * z_raw) / z
    v = (fy * y + cy * z_raw) / z
    return u, v, z
