import numpy as np
import pytest

from point_slam_tpu.config import load_config
from point_slam_tpu.datasets import Synthetic, get_dataset
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def synth_cfg(n=10, h=60, w=80):
    cfg = load_config(os.path.join(HERE, "configs", "Synthetic", "room.yaml"),
                      os.path.join(HERE, "configs", "point_slam.yaml"))
    cfg["synthetic"]["n_frames"] = n
    cfg["cam"].update({"H": h, "W": w, "fx": 50.0, "fy": 50.0,
                       "cx": (w - 1) / 2, "cy": (h - 1) / 2})
    return cfg


def test_synthetic_shapes():
    ds = get_dataset(synth_cfg())
    idx, color, depth, pose = ds[0]
    assert color.shape == (60, 80, 3) and depth.shape == (60, 80)
    assert color.dtype == np.float32
    assert (depth > 0).all() and (depth < 20).all()
    assert np.isfinite(pose).all()
    # reference convention: camera looks along -z
    assert np.allclose(pose[3], [0, 0, 0, 1])


def test_synthetic_multiview_consistency():
    """Backproject frame-0 pixels via its depth, re-project into frame 5; the
    color field is a function of the 3D point, so colors must agree wherever
    the reprojection lands in-bounds. Validates the full pose convention."""
    ds = get_dataset(synth_cfg(n=20))
    _, c0, d0, p0 = ds[0]
    _, c5, d5, p5 = ds[5]
    h, w = d0.shape
    fx, fy, cx, cy = ds.fx, ds.fy, ds.cx, ds.cy
    jj, ii = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    dirs = np.stack([(ii - cx) / fx, -(jj - cy) / fy, -np.ones_like(ii)], -1)
    pts = p0[:3, 3] + (dirs @ p0[:3, :3].T) * d0[..., None]

    w2c = np.linalg.inv(p5)
    cam = (np.concatenate([pts.reshape(-1, 3),
                           np.ones((h * w, 1))], 1) @ w2c.T)[:, :3]
    # invert the ray map: cam = t*[(i-cx)/fx, -(j-cy)/fy, -1], t = -cam_z
    u = cam[:, 0] * fx / (-cam[:, 2]) + cx
    v = -cam[:, 1] * fy / (-cam[:, 2]) + cy
    inside = (cam[:, 2] < -0.1) & (u >= 0) & (u <= w - 1) & (v >= 0) & (v <= h - 1)
    assert inside.sum() > 100
    ui = np.round(u[inside]).astype(int)
    vi = np.round(v[inside]).astype(int)
    # depth at the target pixel vs the reprojected point's camera depth:
    # where they agree (no occlusion), colors must match closely
    z = -cam[inside, 2]
    zvis = np.abs(d5[vi, ui] - z) < 0.05
    src_col = c0.reshape(-1, 3)[inside][zvis]
    dst_col = c5[vi[zvis], ui[zvis]]
    err = np.abs(src_col - dst_col).mean()
    assert err < 0.03, f"multiview color mismatch {err}"


def test_synthetic_trajectory_moves():
    ds = get_dataset(synth_cfg(n=30))
    p0, p10 = ds.poses[0], ds.poses[10]
    assert np.linalg.norm(p0[:3, 3] - p10[:3, 3]) > 0.1


@pytest.mark.parametrize("name", ["replica", "scannet", "tumrgbd", "synthetic"])
def test_registry(name):
    from point_slam_tpu.datasets import dataset_dict
    assert name in dataset_dict


def furnished_cfg(n=20, h=60, w=80):
    cfg = load_config(
        os.path.join(HERE, "configs", "Synthetic", "room_furnished.yaml"),
        os.path.join(HERE, "configs", "point_slam.yaml"))
    cfg["synthetic"]["n_frames"] = n
    cfg["cam"].update({"H": h, "W": w, "fx": 50.0, "fy": 50.0,
                       "cx": (w - 1) / 2, "cy": (h - 1) / 2})
    return cfg


def test_furnished_objects_occlude_walls():
    """Interior objects must appear as depth < wall depth somewhere, and the
    bare-room depth must upper-bound the furnished depth everywhere."""
    ds_f = get_dataset(furnished_cfg())
    cfg_b = furnished_cfg()
    cfg_b["synthetic"].update({"objects": 0})
    ds_b = get_dataset(cfg_b)
    assert len(ds_f.spheres) + len(ds_f.boxes) == 8
    hit_any = False
    for i in (0, 7, 14):
        _, _, df, _ = ds_f[i]
        _, _, db, _ = ds_b[i]
        assert (df <= db + 1e-6).all()
        hit_any |= bool((df < db - 0.05).any())
    assert hit_any, "no object visible in sampled frames"


def test_furnished_multiview_consistency():
    """Same reprojection invariant as the bare room, now across objects."""
    ds = get_dataset(furnished_cfg())
    _, c0, d0, p0 = ds[0]
    _, c5, d5, p5 = ds[5]
    h, w = d0.shape
    fx, fy, cx, cy = ds.fx, ds.fy, ds.cx, ds.cy
    jj, ii = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    dirs = np.stack([(ii - cx) / fx, -(jj - cy) / fy, -np.ones_like(ii)], -1)
    pts = p0[:3, 3] + (dirs @ p0[:3, :3].T) * d0[..., None]
    w2c = np.linalg.inv(p5)
    cam = (np.concatenate([pts.reshape(-1, 3),
                           np.ones((h * w, 1))], 1) @ w2c.T)[:, :3]
    u = cam[:, 0] * fx / (-cam[:, 2]) + cx
    v = -cam[:, 1] * fy / (-cam[:, 2]) + cy
    inside = (cam[:, 2] < -0.1) & (u >= 0) & (u <= w - 1) & (v >= 0) & (v <= h - 1)
    assert inside.sum() > 100
    ui = np.round(u[inside]).astype(int)
    vi = np.round(v[inside]).astype(int)
    z = -cam[inside, 2]
    zvis = np.abs(d5[vi, ui] - z) < 0.05
    src_col = c0.reshape(-1, 3)[inside][zvis]
    dst_col = c5[vi[zvis], ui[zvis]]
    err = np.abs(src_col - dst_col).mean()
    assert err < 0.05, f"multiview color mismatch {err}"


def test_furnished_gt_mesh_matches_depth():
    """gt_mesh() surface must lie on the rendered depth: backprojected depth
    pixels are within a tolerance of the analytic mesh (sampled)."""
    ds = get_dataset(furnished_cfg())
    v, f = ds.gt_mesh(subdiv=48, sphere_res=32)
    assert len(v) > 1000 and f.max() < len(v)
    from scipy.spatial import cKDTree
    tree = cKDTree(v)
    _, _, d0, p0 = ds[10]
    h, w = d0.shape
    jj, ii = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    dirs = np.stack([(ii - ds.cx) / ds.fx, -(jj - ds.cy) / ds.fy,
                     -np.ones_like(ii)], -1)
    pts = (p0[:3, 3] + (dirs @ p0[:3, :3].T) * d0[..., None]).reshape(-1, 3)
    dist, _ = tree.query(pts[::37], k=1)
    # vertex spacing bounds the point-to-vertex distance (walls ~9cm grid)
    assert np.percentile(dist, 95) < 0.08, np.percentile(dist, 95)
