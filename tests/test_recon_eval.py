import os

import numpy as np
import pytest

from point_slam_tpu.tools.eval_recon import (calc_2d_metric, calc_3d_metric,
                                             icp_point_to_point,
                                             sample_surface)
from point_slam_tpu.tools.marching import marching_tetrahedra
from point_slam_tpu.utils.ply import write_ply
from point_slam_tpu.utils.raster import rasterize_depth


def sphere_mesh(r=0.5, n=40):
    ax = np.linspace(-1, 1, n)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    sdf = np.sqrt(x ** 2 + y ** 2 + z ** 2) - r
    v, f, _ = marching_tetrahedra(sdf, 0.0, (-1, -1, -1), ax[1] - ax[0])
    return v, f


@pytest.fixture(scope="module")
def sphere():
    return sphere_mesh()


def test_rasterizer_native_matches_numpy(sphere):
    v, f = sphere
    c2w = np.eye(4)
    c2w[2, 3] = 2.0  # camera at z=2 looking down -z at the sphere
    w2c = np.linalg.inv(c2w).astype(np.float32)
    args = (v, f, w2c, 100.0, 100.0, 49.5, 49.5, 100, 100)
    d_native = rasterize_depth(*args)
    d_numpy = rasterize_depth(*args, force_numpy=True)
    # the sphere front face is at depth 2 - 0.5 = 1.5
    assert abs(d_native[50, 50] - 1.5) < 0.05
    both = (d_native > 0) & (d_numpy > 0)
    assert both.mean() > 0.1
    assert np.abs(d_native[both] - d_numpy[both]).max() < 1e-3
    # silhouettes agree
    assert ((d_native > 0) == (d_numpy > 0)).mean() > 0.995


def test_rasterizer_empty_view(sphere):
    v, f = sphere
    c2w = np.eye(4)
    c2w[2, 3] = -3.0  # sphere is behind the camera
    d = rasterize_depth(v, f, np.linalg.inv(c2w), 100.0, 100.0, 49.5, 49.5,
                        100, 100)
    assert (d == 0).all()


def test_sample_surface_on_sphere(sphere):
    v, f = sphere
    pts = sample_surface(v, f, 5000, seed=0)
    radii = np.linalg.norm(pts, axis=1)
    np.testing.assert_allclose(radii.mean(), 0.5, atol=0.03)
    assert radii.std() < 0.05


def test_icp_recovers_rigid_offset(sphere):
    v, f = sphere
    rng = np.random.default_rng(0)
    from scipy.spatial.transform import Rotation
    rot = Rotation.from_euler("xyz", [0.05, -0.03, 0.08]).as_matrix()
    t = np.array([0.03, -0.02, 0.05])
    moved = v @ rot.T + t
    tf = icp_point_to_point(moved, v)
    recovered = moved @ tf[:3, :3].T + tf[:3, 3]
    # a sphere is rotationally symmetric, so compare surfaces (NN distance),
    # not per-vertex correspondences
    from scipy.spatial import cKDTree
    d_after = cKDTree(v).query(recovered, k=1)[0].mean()
    d_before = cKDTree(v).query(moved, k=1)[0].mean()
    # the floor is the vertex spacing (~0.01 on this mesh); ICP must reach it
    assert d_after < 0.012 and d_after < d_before / 2.5, (d_before, d_after)
    # recovered translation close to the true inverse
    np.testing.assert_allclose(tf[:3, 3], -rot.T @ t, atol=5e-3)


def test_3d_metric_self_is_perfect(sphere, tmp_path):
    v, f = sphere
    p = str(tmp_path / "s.ply")
    write_ply(p, v, f)
    # sample densely enough that inter-sample spacing << tau (1 cm at unit
    # scale here; the real meshes are metric so 200k default is plenty)
    r = calc_3d_metric(p, p, n_samples=150_000)
    assert r["F-score"] > 97.0
    assert r["accuracy"] < 0.35 and r["completion"] < 0.35


def test_3d_metric_detects_deformation(sphere, tmp_path):
    v, f = sphere
    p1 = str(tmp_path / "a.ply")
    p2 = str(tmp_path / "b.ply")
    write_ply(p1, v, f)
    write_ply(p2, v * 1.08, f)  # 8% inflated: ~4 cm radial error
    r = calc_3d_metric(p1, p2, n_samples=20000, icp_align=False)
    assert r["F-score"] < 50.0
    assert r["accuracy"] > 1.0  # cm


def test_2d_metric_self(sphere, tmp_path):
    v, f = sphere
    p = str(tmp_path / "s.ply")
    write_ply(p, v, f)
    r = calc_2d_metric(p, p, align=False, n_imgs=5)
    assert r["depth l1"] < 1e-4


def test_cull_mesh(sphere):
    from point_slam_tpu.tools.cull_mesh import cull_mesh
    v, f = sphere
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 2.0
    # narrow FOV (+-4.7 deg): only the central part of the sphere is inside
    # the frustum (the cull is frustum-only, no occlusion — parity with
    # src/tools/cull_mesh.py)
    v2, f2, used = cull_mesh(v, f, c2w[None], H=100, W=100, fx=600, fy=600,
                             cx=49.5, cy=49.5)
    assert 0 < len(f2) < len(f)
    assert len(v2) < len(v)


def test_point_to_mesh_distance_exact():
    """Exact distances against a unit square (two triangles) at z=0."""
    import numpy as np
    from point_slam_tpu.tools.eval_recon import point_to_mesh_distance
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], float)
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    pts = np.array([
        [0.5, 0.5, 0.3],    # above interior -> 0.3
        [0.5, 0.5, -0.2],   # below interior -> 0.2
        [2.0, 0.5, 0.0],    # beyond +x edge -> 1.0
        [-1.0, -1.0, 0.0],  # beyond corner -> sqrt(2)
        [0.25, 0.75, 0.0],  # on surface -> 0
        [1.5, 1.5, 1.0],    # corner + height
    ])
    d, f = point_to_mesh_distance(pts, verts, faces, k=2)
    exp = [0.3, 0.2, 1.0, np.sqrt(2), 0.0, np.sqrt(0.25 + 0.25 + 1.0)]
    np.testing.assert_allclose(d, exp, atol=1e-12)


def test_point_to_mesh_distance_matches_dense_sampling():
    """On a sphere mesh, exact point-to-triangle ~ analytic |r - R| while
    sampled NN carries a positive bias."""
    import numpy as np
    from point_slam_tpu.tools.eval_recon import (point_to_mesh_distance,
                                                 sample_surface)
    from scipy.spatial import cKDTree
    th = np.linspace(0, np.pi, 25)
    ph = np.linspace(0, 2 * np.pi, 49)
    T, P = np.meshgrid(th, ph, indexing="ij")
    V = np.stack([np.sin(T) * np.cos(P), np.cos(T),
                  np.sin(T) * np.sin(P)], -1).reshape(-1, 3)
    F = []
    for a in range(24):
        for b in range(48):
            i0 = a * 49 + b
            F.append([i0, i0 + 49, i0 + 1])
            F.append([i0 + 1, i0 + 49, i0 + 50])
    F = np.array(F)
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(2000, 3))
    pts = pts / np.linalg.norm(pts, axis=1, keepdims=True) * \
        rng.uniform(0.8, 1.2, (2000, 1))
    d_exact, _ = point_to_mesh_distance(pts, V, F)
    d_true = np.abs(np.linalg.norm(pts, axis=1) - 1.0)
    # chordal flattening of the coarse sphere mesh bounds the error
    assert np.abs(d_exact - d_true).max() < 6e-3
    # sampled-NN at low density shows the bias the exact method removes
    s = sample_surface(V, F, 2000, seed=3)
    d_nn, _ = cKDTree(s).query(pts, k=1)
    assert (d_nn - d_exact).min() > -1e-9     # NN never underestimates
    assert (d_nn - d_exact).mean() > 0.01     # and is biased at low density
