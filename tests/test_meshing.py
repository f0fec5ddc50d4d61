import os

import numpy as np
import pytest

from point_slam_tpu.tools.marching import (connected_components_filter,
                                           marching_tetrahedra)
from point_slam_tpu.tools.tsdf import TSDFVolume
from point_slam_tpu.utils.ply import read_ply, write_ply


def sphere_sdf(n=48, r=0.5):
    ax = np.linspace(-1, 1, n)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    return np.sqrt(x ** 2 + y ** 2 + z ** 2) - r, ax[1] - ax[0]


def test_marching_tets_sphere():
    sdf, voxel = sphere_sdf()
    verts, faces, _ = marching_tetrahedra(sdf, 0.0, origin=(-1, -1, -1),
                                          voxel=voxel)
    assert len(verts) > 500 and len(faces) > 500
    radii = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(radii, 0.5, atol=0.06)
    # faces reference valid vertices
    assert faces.max() < len(verts) and faces.min() >= 0
    # normals point outward (away from the center)
    tri = verts[faces]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    c = tri.mean(1)
    outward = (n * c).sum(1)
    assert (outward > 0).mean() > 0.99


def test_marching_tets_color_interpolation():
    sdf, voxel = sphere_sdf(n=24)
    color = np.zeros(sdf.shape + (3,), np.float32)
    color[..., 0] = 1.0  # uniformly red
    verts, faces, vcols = marching_tetrahedra(sdf, 0.0, origin=(-1, -1, -1),
                                              voxel=voxel, color=color)
    assert vcols is not None
    np.testing.assert_allclose(vcols[:, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(vcols[:, 1:], 0.0, atol=1e-5)


def test_connected_components_filter():
    sdf, voxel = sphere_sdf(n=32, r=0.5)
    # add a tiny floating blob
    ax = np.linspace(-1, 1, 32)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    blob = np.sqrt((x - 0.85) ** 2 + (y - 0.85) ** 2 + (z - 0.85) ** 2) - 0.06
    sdf = np.minimum(sdf, blob)
    verts, faces, _ = marching_tetrahedra(sdf, 0.0, (-1, -1, -1), voxel)
    nv_before = len(verts)
    verts2, faces2, keep = connected_components_filter(verts, faces, 100)
    assert len(verts2) < nv_before
    # the big sphere survives
    radii = np.linalg.norm(verts2, axis=1)
    assert np.abs(radii - 0.5).max() < 0.08


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    verts = rng.normal(size=(50, 3)).astype(np.float32)
    faces = rng.integers(0, 50, size=(30, 3)).astype(np.int32)
    colors = rng.random((50, 3)).astype(np.float32)
    p = str(tmp_path / "m.ply")
    write_ply(p, verts, faces, colors)
    v2, f2, c2 = read_ply(p)
    np.testing.assert_allclose(v2, verts, atol=1e-6)
    np.testing.assert_array_equal(f2, faces)
    np.testing.assert_allclose(c2 / 255.0, colors, atol=1 / 255.0 + 1e-6)


def test_tsdf_fusion_box_room():
    """Integrate analytic synthetic RGB-D; mesh must sit on the box walls."""
    from point_slam_tpu.config import load_config
    from point_slam_tpu.datasets import get_dataset
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(here, "configs", "Synthetic", "room.yaml"),
                      os.path.join(here, "configs", "point_slam.yaml"))
    cfg["synthetic"].update({"n_frames": 8, "angular_step": 0.25})
    cfg["cam"].update({"H": 60, "W": 80, "fx": 45.0, "fy": 45.0,
                       "cx": 39.5, "cy": 29.5})
    ds = get_dataset(cfg)
    box = ds.box

    vol = TSDFVolume.from_bounds(-box, box, voxel=0.08, sdf_trunc=0.24,
                                 margin=0.1)
    for i in range(8):
        _, color, depth, c2w = ds[i]
        vol.integrate(depth, color, c2w, ds.fx, ds.fy, ds.cx, ds.cy)
    verts, faces, vcols = vol.extract_mesh()
    assert len(verts) > 200
    # signed distance of each vertex to the box surface
    q = np.abs(verts) - box[None, :]
    outside = np.linalg.norm(np.maximum(q, 0), axis=1)
    inside = np.minimum(np.max(q, axis=1), 0)
    d = outside + inside
    assert np.abs(d).mean() < 0.06, f"mean |sdf| {np.abs(d).mean():.3f}"
    # colors close to the analytic color field at the vertex
    cf = ds._color_field(verts)
    assert np.abs(vcols - cf).mean() < 0.15


def test_marching_native_matches_numpy():
    """The C++ extractor (native/marching.cpp) must reproduce the numpy
    oracle's geometry exactly: same welded vertex set, same face set (as
    position triples), interpolated colors equal."""
    from point_slam_tpu.tools import marching
    if marching._load_native() is None:
        pytest.skip("native marching library unavailable")
    rng = np.random.default_rng(7)
    nx, ny, nz = 40, 36, 28
    x, y, z = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                          indexing="ij")
    sdf = np.clip((np.sqrt((x - 20.0) ** 2 + (y - 18.0) ** 2
                           + (z - 14.0) ** 2) - 9.0) / 3.0, -1, 1
                  ).astype(np.float32)
    sdf += 0.05 * rng.normal(size=sdf.shape).astype(np.float32)
    w = (np.abs(sdf) < 1).astype(np.float32)
    col = rng.random((nx, ny, nz, 3)).astype(np.float32)

    v1, f1, c1 = marching.marching_tetrahedra(
        sdf, iso=0.0, origin=(0.5, -0.25, 1.0), voxel=0.04,
        weight=w, color=col, native=False)
    v2, f2, c2 = marching.marching_tetrahedra(
        sdf, iso=0.0, origin=(0.5, -0.25, 1.0), voxel=0.04,
        weight=w, color=col, native=True)
    assert len(v1) == len(v2) and len(f1) == len(f2)

    def vkeys(v):
        q = np.round(v / 0.04 * 1e5).astype(np.int64)
        return q[np.lexsort(q.T)]

    np.testing.assert_array_equal(vkeys(v1), vkeys(v2))

    def fkeys(v, f):
        q = np.round(v / 0.04 * 1e5).astype(np.int64)
        tri = np.sort(q[f], axis=1).reshape(len(f), 9)
        return tri[np.lexsort(tri.T)]

    np.testing.assert_array_equal(fkeys(v1, f1), fkeys(v2, f2))
    # colors: match per-vertex through the sorted correspondence
    o1 = np.lexsort(np.round(v1 / 0.04 * 1e5).astype(np.int64).T)
    o2 = np.lexsort(np.round(v2 / 0.04 * 1e5).astype(np.int64).T)
    np.testing.assert_allclose(c1[o1], c2[o2], atol=1e-6)


def test_tsdf_normal_weighting_parity_and_quality():
    """normal_weighting=True (cos-angle integration weights, beyond the
    reference's plain projective TSDF) must keep the synthetic-box error at
    least as small as the default path and produce the same grid shapes."""
    from point_slam_tpu.config import load_config
    from point_slam_tpu.datasets import get_dataset
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(here, "configs", "Synthetic", "room.yaml"),
                      os.path.join(here, "configs", "point_slam.yaml"))
    cfg["synthetic"].update({"n_frames": 6, "angular_step": 0.3})
    cfg["cam"].update({"H": 48, "W": 64, "fx": 36.0, "fy": 36.0,
                       "cx": 31.5, "cy": 23.5})
    ds = get_dataset(cfg)
    box = ds.box

    def err(nw):
        vol = TSDFVolume.from_bounds(-box, box, voxel=0.1, sdf_trunc=0.3,
                                     margin=0.1, normal_weighting=nw)
        for i in range(6):
            _, color, depth, c2w = ds[i]
            vol.integrate(depth, color, c2w, ds.fx, ds.fy, ds.cx, ds.cy)
        verts, faces, _ = vol.extract_mesh()
        assert len(verts) > 100
        q = np.abs(verts) - box[None, :]
        outside = np.linalg.norm(np.maximum(q, 0), axis=1)
        inside = np.minimum(np.max(q, axis=1), 0)
        return np.abs(outside + inside).mean()

    e0, e1 = err(False), err(True)
    assert e1 < e0 * 1.25, (e0, e1)   # never substantially worse
    assert e1 < 0.08
