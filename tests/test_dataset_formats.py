"""On-disk format tests for the Replica / ScanNet / TUM-RGBD readers.

Each fixture writes a tiny dataset in the exact directory layout the reference
consumes (src/utils/datasets.py:124-281), using the procedural Synthetic scene
for image content, then checks decoded shapes, depth scaling, pose-axis flips,
and (for Replica) runs a micro-SLAM end-to-end from disk.
"""
import os

import numpy as np
import cv2
import pytest

from point_slam_tpu.config import load_config
from point_slam_tpu.datasets import Synthetic, get_dataset, _flip_yz

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

H, W = 48, 64
FX = FY = 40.0
CX, CY = 31.5, 23.5
DEPTH_SCALE = 6553.5
N = 4


def base_cfg(name):
    cfg = load_config(os.path.join(HERE, "configs", "Synthetic", "room.yaml"),
                      os.path.join(HERE, "configs", "point_slam.yaml"))
    cfg["dataset"] = name
    cfg["cam"].update({"H": H, "W": W, "fx": FX, "fy": FY, "cx": CX, "cy": CY,
                       "png_depth_scale": DEPTH_SCALE, "crop_edge": 0})
    cfg["synthetic"].update({"n_frames": N, "angular_step": 0.02})
    cfg["verbose"] = False
    return cfg


def synth_frames():
    cfg = base_cfg("synthetic")
    ds = Synthetic(cfg)
    out = []
    for i in range(N):
        _, color, depth, c2w = ds[i]
        out.append((color, depth, ds.poses[i]))  # raw pose, pre-flip-free
    return out


def write_images(color, depth, cpath, dpath):
    bgr = cv2.cvtColor((np.clip(color, 0, 1) * 255).astype(np.uint8),
                       cv2.COLOR_RGB2BGR)
    cv2.imwrite(cpath, bgr, [cv2.IMWRITE_JPEG_QUALITY, 98]
                if cpath.endswith(".jpg") else [])
    cv2.imwrite(dpath, (depth * DEPTH_SCALE).astype(np.uint16))


@pytest.fixture(scope="module")
def frames():
    return synth_frames()


def check_frame(ds, frames, i, color_atol=0.05):
    idx, color, depth, c2w = ds[i]
    ref_color, ref_depth, ref_pose = frames[i]
    assert color.shape == (H, W, 3) and depth.shape == (H, W)
    np.testing.assert_allclose(color, ref_color, atol=color_atol)
    np.testing.assert_allclose(depth, ref_depth, atol=1.0 / DEPTH_SCALE * 2)
    # readers apply the Y/Z axis flip to stored poses
    np.testing.assert_allclose(c2w, _flip_yz(ref_pose).astype(np.float32),
                               atol=1e-5)


def test_replica_format(tmp_path, frames):
    root = tmp_path / "room0"
    (root / "results").mkdir(parents=True)
    lines = []
    for i, (color, depth, pose) in enumerate(frames):
        write_images(color, depth,
                     str(root / "results" / f"frame{i:06d}.jpg"),
                     str(root / "results" / f"depth{i:06d}.png"))
        lines.append(" ".join(f"{v:.9f}" for v in pose.reshape(-1)))
    (root / "traj.txt").write_text("\n".join(lines) + "\n")

    cfg = base_cfg("replica")
    ds = get_dataset(cfg, str(root))
    assert len(ds) == N
    for i in range(N):
        check_frame(ds, frames, i)


def test_scannet_format(tmp_path, frames):
    root = tmp_path / "scene0000_00"
    for sub in ("color", "depth", "pose"):
        (root / "frames" / sub).mkdir(parents=True)
    for i, (color, depth, pose) in enumerate(frames):
        write_images(color, depth,
                     str(root / "frames" / "color" / f"{i}.jpg"),
                     str(root / "frames" / "depth" / f"{i}.png"))
        np.savetxt(str(root / "frames" / "pose" / f"{i}.txt"), pose)

    cfg = base_cfg("scannet")
    ds = get_dataset(cfg, str(root))
    assert len(ds) == N
    # ScanNet sorts numerically, not lexically: with 12 frames "10" must not
    # precede "2"; with 4 it still exercises the key function
    for i in range(N):
        check_frame(ds, frames, i)


def test_tum_format(tmp_path, frames):
    from scipy.spatial.transform import Rotation
    root = tmp_path / "fr1_desk"
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()
    rgb_lines, dep_lines, gt_lines = ["# rgb"], ["# depth"], ["# gt"]
    for i, (color, depth, pose) in enumerate(frames):
        # timestamps: rgb and depth slightly offset (association must match),
        # 0.5 s apart so the 32 fps subsampling keeps every frame
        t = 100.0 + 0.5 * i
        write_images(color, depth,
                     str(root / "rgb" / f"{t:.4f}.jpg"),
                     str(root / "depth" / f"{t + 0.01:.4f}.png"))
        rgb_lines.append(f"{t:.4f} rgb/{t:.4f}.jpg")
        dep_lines.append(f"{t + 0.01:.4f} depth/{t + 0.01:.4f}.png")
        q = Rotation.from_matrix(pose[:3, :3]).as_quat()  # xyzw
        tr = pose[:3, 3]
        gt_lines.append(f"{t + 0.005:.4f} " + " ".join(
            f"{v:.9f}" for v in [*tr, *q]))
    (root / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")
    (root / "depth.txt").write_text("\n".join(dep_lines) + "\n")
    (root / "groundtruth.txt").write_text("\n".join(gt_lines) + "\n")

    cfg = base_cfg("tumrgbd")
    cfg["cam"]["distortion"] = [0.0, 0.0, 0.0, 0.0, 0.0]  # undistort path runs
    ds = get_dataset(cfg, str(root))
    assert len(ds) == N
    # TUM normalizes the first pose to identity before the axis flip
    idx, color, depth, c2w = ds[0]
    np.testing.assert_allclose(c2w, _flip_yz(np.eye(4)).astype(np.float32),
                               atol=1e-6)
    # relative poses preserved: inv(p0) @ p_i
    for i in range(1, N):
        ref_rel = np.linalg.inv(frames[0][2]) @ frames[i][2]
        _, _, _, ci = ds[i]
        np.testing.assert_allclose(ci, _flip_yz(ref_rel).astype(np.float32),
                                   atol=1e-5)
    # decoded content matches
    np.testing.assert_allclose(color, frames[0][0], atol=0.05)
    np.testing.assert_allclose(depth, frames[0][1], atol=2.0 / DEPTH_SCALE)


def test_slam_from_replica_format_on_disk(tmp_path, frames):
    """Micro-SLAM straight from a Replica-format directory."""
    root = tmp_path / "room0"
    (root / "results").mkdir(parents=True)
    lines = []
    for i, (color, depth, pose) in enumerate(frames):
        write_images(color, depth,
                     str(root / "results" / f"frame{i:06d}.jpg"),
                     str(root / "results" / f"depth{i:06d}.png"))
        lines.append(" ".join(f"{v:.9f}" for v in pose.reshape(-1)))
    (root / "traj.txt").write_text("\n".join(lines) + "\n")

    from point_slam_tpu.slam import PointSLAM
    cfg = base_cfg("replica")
    cfg["tracking"].update({"pixels": 200, "iters": 5,
                            "ignore_edge_W": 5, "ignore_edge_H": 5})
    cfg["mapping"].update({
        "pixels": 300, "pixels_adding": 150, "pixels_based_on_color_grad": 30,
        "iters": 10, "iters_first": 15, "geo_iter_first": 5,
        "mapping_window_size": 3, "keyframe_every": 2, "every_frame": 2,
        "color_refine": False})
    cfg["tpu"].update({"point_capacity_init": 1 << 12,
                       "point_capacity_max": 1 << 14,
                       "grid_table_size": 1 << 12, "grid_max_per_cell": 64})
    cfg["data"]["output"] = str(tmp_path / "out")
    slam = PointSLAM(cfg, input_folder=str(root))
    summary = slam.run()
    assert summary["n_frames"] == N
    assert summary["n_points"] > 100
    assert np.isfinite(summary["estimate_c2w_list"]).all()
