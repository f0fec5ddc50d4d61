"""Host-side RGB-D dataset readers (numpy), plus a procedural synthetic scene.

Reader parity with src/utils/datasets.py: BGR decode -> RGB /255, uint16 depth
/ png_depth_scale, optional undistortion (color only), color resized to depth
size, optional crop_size resize and crop_edge cropping, and the Y/Z pose-axis
flips applied by every loader (datasets.py:146-148,181-184,266-269).

All readers return numpy; the SLAM loop owns device transfer (double-buffered
prefetch lives in utils/prefetch.py).
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def as_intrinsics_matrix(fx, fy, cx, cy):
    k = np.eye(3)
    k[0, 0], k[1, 1], k[0, 2], k[1, 2] = fx, fy, cx, cy
    return k


def _flip_yz(c2w: np.ndarray) -> np.ndarray:
    """Rotate camera frame 180 deg about X: the codebase convention is x right,
    y up, z backward while most datasets store y down / z forward."""
    c2w = c2w.copy()
    c2w[:3, 1] *= -1
    c2w[:3, 2] *= -1
    return c2w


class BaseDataset:
    def __init__(self, cfg, input_folder: Optional[str] = None):
        self.name = cfg["dataset"]
        cam = cfg["cam"]
        self.png_depth_scale = cam["png_depth_scale"]
        self.H, self.W = cam["H"], cam["W"]
        self.fx, self.fy, self.cx, self.cy = cam["fx"], cam["fy"], cam["cx"], cam["cy"]
        self.distortion = np.array(cam["distortion"]) if "distortion" in cam else None
        self.crop_size = cam.get("crop_size")
        self.crop_edge = cam["crop_edge"] or 0
        self.input_folder = input_folder or cfg["data"]["input_folder"]
        self.color_paths: List[str] = []
        self.depth_paths: List[str] = []
        self.poses: List[np.ndarray] = []

    def __len__(self):
        return self.n_img

    def _read_color(self, path):
        img = cv2.imread(path)
        if self.distortion is not None:
            k = as_intrinsics_matrix(self.fx, self.fy, self.cx, self.cy)
            img = cv2.undistort(img, k, self.distortion)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float64) / 255.0

    def _read_depth(self, path):
        d = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        return d.astype(np.float32) / self.png_depth_scale

    def __getitem__(self, index: int):
        color = self._read_color(self.color_paths[index])
        depth = self._read_depth(self.depth_paths[index])
        h, w = depth.shape
        color = cv2.resize(color, (w, h))
        if self.crop_size is not None:
            ch, cw = self.crop_size
            # bilinear (align_corners) for color, nearest for depth — the
            # lietorch-style preprocessing the reference applies (datasets.py:107-114)
            color = cv2.resize(color, (cw, ch), interpolation=cv2.INTER_LINEAR)
            depth = cv2.resize(depth, (cw, ch), interpolation=cv2.INTER_NEAREST)
        e = self.crop_edge
        if e > 0:
            color = color[e:-e, e:-e]
            depth = depth[e:-e, e:-e]
        return (index, color.astype(np.float32), depth.astype(np.float32),
                self.poses[index].astype(np.float32))


class Replica(BaseDataset):
    def __init__(self, cfg, input_folder=None):
        super().__init__(cfg, input_folder)
        self.color_paths = sorted(glob.glob(f"{self.input_folder}/results/frame*.jpg"))
        self.depth_paths = sorted(glob.glob(f"{self.input_folder}/results/depth*.png"))
        self.n_img = len(self.color_paths)
        with open(f"{self.input_folder}/traj.txt") as f:
            lines = f.readlines()
        self.poses = [
            _flip_yz(np.array(list(map(float, lines[i].split()))).reshape(4, 4))
            for i in range(self.n_img)]


class ScanNet(BaseDataset):
    def __init__(self, cfg, input_folder=None):
        super().__init__(cfg, input_folder)
        self.input_folder = os.path.join(self.input_folder, "frames")
        bynum = lambda p: int(os.path.basename(p).split(".")[0])
        self.color_paths = sorted(
            glob.glob(os.path.join(self.input_folder, "color", "*.jpg")), key=bynum)
        self.depth_paths = sorted(
            glob.glob(os.path.join(self.input_folder, "depth", "*.png")), key=bynum)
        self.n_img = len(self.color_paths)
        self.poses = []
        for p in sorted(glob.glob(os.path.join(self.input_folder, "pose", "*.txt")),
                        key=bynum):
            mat = np.loadtxt(p).reshape(4, 4)
            self.poses.append(_flip_yz(mat))


class TUM_RGBD(BaseDataset):
    def __init__(self, cfg, input_folder=None, frame_rate=32):
        super().__init__(cfg, input_folder)
        self.color_paths, self.depth_paths, self.poses = self._load(
            self.input_folder, frame_rate)
        self.n_img = len(self.color_paths)

    @staticmethod
    def _parse_list(path, skiprows=0):
        return np.loadtxt(path, delimiter=" ", dtype=np.str_, skiprows=skiprows)

    @staticmethod
    def _associate(t_img, t_depth, t_pose, max_dt=0.08):
        out = []
        for i, t in enumerate(t_img):
            j = np.argmin(np.abs(t_depth - t))
            k = np.argmin(np.abs(t_pose - t))
            if abs(t_depth[j] - t) < max_dt and abs(t_pose[k] - t) < max_dt:
                out.append((i, j, k))
        return out

    def _load(self, folder, frame_rate):
        pose_file = (os.path.join(folder, "groundtruth.txt")
                     if os.path.isfile(os.path.join(folder, "groundtruth.txt"))
                     else os.path.join(folder, "pose.txt"))
        img_data = self._parse_list(os.path.join(folder, "rgb.txt"))
        depth_data = self._parse_list(os.path.join(folder, "depth.txt"))
        pose_data = self._parse_list(pose_file, skiprows=1)
        pose_vecs = pose_data[:, 1:].astype(np.float64)
        t_img = img_data[:, 0].astype(np.float64)
        t_depth = depth_data[:, 0].astype(np.float64)
        t_pose = pose_data[:, 0].astype(np.float64)
        assoc = self._associate(t_img, t_depth, t_pose)

        picks = [0]
        for i in range(1, len(assoc)):
            t0 = t_img[assoc[picks[-1]][0]]
            t1 = t_img[assoc[i][0]]
            if t1 - t0 > 1.0 / frame_rate:
                picks.append(i)

        images, depths, poses = [], [], []
        inv_first = None
        for ix in picks:
            i, j, k = assoc[ix]
            images.append(os.path.join(folder, img_data[i, 1]))
            depths.append(os.path.join(folder, depth_data[j, 1]))
            c2w = self._pose_from_quat(pose_vecs[k])
            if inv_first is None:
                inv_first = np.linalg.inv(c2w)
                c2w = np.eye(4)
            else:
                c2w = inv_first @ c2w
            poses.append(_flip_yz(c2w))
        return images, depths, poses

    @staticmethod
    def _pose_from_quat(pvec):
        from scipy.spatial.transform import Rotation
        pose = np.eye(4)
        pose[:3, :3] = Rotation.from_quat(pvec[3:]).as_matrix()
        pose[:3, 3] = pvec[:3]
        return pose


class Synthetic(BaseDataset):
    """Procedural RGB-D room: a textured axis-aligned box observed from a
    circular trajectory. Analytic depth (ray/box intersection) and a smooth
    3D color field give consistent multi-view supervision with exact poses —
    used by the e2e tests and bench.py since the image ships no datasets.
    """

    def __init__(self, cfg, input_folder=None):
        super().__init__(cfg, input_folder)
        syn = cfg.get("synthetic", {})
        self.n_img = syn.get("n_frames", 100)
        self.box = np.array(syn.get("half_extent", [3.0, 2.2, 2.6]))
        self.noise = syn.get("depth_noise", 0.0)
        self.dropout = syn.get("depth_dropout", 0.0)  # fraction of zero-depth
        self.seed = syn.get("seed", 7)
        # per-frame angular step; default sweeps 0.6 turns over >=60 frames so
        # inter-frame motion stays SLAM-trackable (a few cm, Replica-like)
        self.ang_step = syn.get("angular_step",
                                2 * np.pi * 0.6 / max(self.n_img, 60))
        self.poses = [self._pose(t) for t in range(self.n_img)]
        self._cache: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}

    def _pose(self, t):
        ang = self.ang_step * t
        radius = 0.8
        eye = np.array([radius * np.cos(ang), 0.25 * np.sin(2 * ang),
                        radius * np.sin(ang)])
        # look toward a slowly rotating target on the walls
        tgt_ang = ang + 0.9
        target = np.array([2.5 * np.cos(tgt_ang), 0.4 * np.sin(tgt_ang),
                           2.2 * np.sin(tgt_ang)])
        fwd = target - eye
        fwd /= np.linalg.norm(fwd)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        c2w = np.eye(4)
        # camera convention: x right, y up, z backward (-z = viewing)
        c2w[:3, 0] = right
        c2w[:3, 1] = up
        c2w[:3, 2] = -fwd
        c2w[:3, 3] = eye
        return c2w

    def _color_field(self, pts):
        """Smooth procedural 3D texture in [0,1]^3."""
        x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
        r = 0.5 + 0.25 * np.sin(2.1 * x) * np.cos(1.3 * z) + 0.25 * np.sin(3.7 * y)
        g = 0.5 + 0.25 * np.cos(1.7 * x + 2.0 * y) + 0.25 * np.sin(2.9 * z)
        b = 0.5 + 0.25 * np.sin(1.1 * x + 1.9 * z) + 0.25 * np.cos(2.3 * y)
        return np.clip(np.stack([r, g, b], -1), 0.0, 1.0)

    def __getitem__(self, index):
        if index not in self._cache:
            c2w = self.poses[index]
            h, w = self.H, self.W
            jj, ii = np.meshgrid(np.arange(h, dtype=np.float64),
                                 np.arange(w, dtype=np.float64), indexing="ij")
            dirs = np.stack([(ii - self.cx) / self.fx,
                             -(jj - self.cy) / self.fy,
                             -np.ones_like(ii)], -1)
            rd = dirs @ c2w[:3, :3].T
            ro = c2w[:3, 3]
            # ray/axis-aligned-box exit distance (camera inside the box)
            with np.errstate(divide="ignore"):
                t1 = (self.box[None, None] - ro) / rd
                t2 = (-self.box[None, None] - ro) / rd
            t_exit = np.minimum(np.maximum(t1, t2).min(-1), 1e9)
            pts = ro + rd * t_exit[..., None]
            depth = t_exit  # z-depth == ray parameter since |dir_z|=1? no:
            # the reference convention treats z_vals as the ray parameter with
            # unnormalized dirs; sensor depth is the distance along the ray
            # parameterization, so t_exit is the correct "depth".
            color = self._color_field(pts)
            if self.noise > 0:
                rng = np.random.default_rng(self.seed + index)
                depth = depth * (1 + self.noise * rng.standard_normal(depth.shape))
            if self.dropout > 0:
                # sensor holes (TUM/ScanNet-like): depth==0 marks invalid
                rng = np.random.default_rng(self.seed * 7919 + index)
                depth = np.where(rng.uniform(size=depth.shape) < self.dropout,
                                 0.0, depth)
            self._cache[index] = (color.astype(np.float32),
                                  depth.astype(np.float32))
        color, depth = self._cache[index]
        e = self.crop_edge
        if e > 0:
            color, depth = color[e:-e, e:-e], depth[e:-e, e:-e]
        return index, color, depth, self.poses[index].astype(np.float32)


dataset_dict = {
    "replica": Replica,
    "scannet": ScanNet,
    "tumrgbd": TUM_RGBD,
    "synthetic": Synthetic,
}


def get_dataset(cfg, input_folder=None):
    return dataset_dict[cfg["dataset"]](cfg, input_folder)
