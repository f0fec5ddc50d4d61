"""Mesh extraction pipeline: saved renders -> TSDF fusion -> surface mesh.

Mirrors src/tools/get_mesh_tsdf_fusion.py: integrates the re-rendered RGB-D
frames (rendered depth zeroed wherever the sensor saw no depth) at voxel
5/512 m / trunc 0.04 m along the estimated trajectory, extracts the surface,
and (for non-Replica data or on request) drops small connected components.
Also provides the standalone mesh-from-checkpoint CLI (the reference's
"serve/export" path, SURVEY §3.5).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from typing import Optional

import numpy as np

from point_slam_tpu.tools.tsdf import TSDFVolume
from point_slam_tpu.utils.ply import write_ply


def fuse_renders(render_dir: str, dataset, estimate_c2w_list, every: int,
                 intrinsics, voxel=5.0 / 512.0, sdf_trunc=0.04,
                 bounds_margin=0.2, verbose=True,
                 normal_weighting=False, mesh_freq: int = -1,
                 mid_mesh_dir: Optional[str] = None,
                 clean: bool = False) -> TSDFVolume:
    """Integrate saved renders into a TSDF volume.

    With ``mesh_freq`` > 0, writes an intermediate mesh every mesh_freq
    integrated frames to ``mid_mesh_dir`` (the reference's periodic
    ``mid_mesh/frame_<i>_mesh.ply`` dumps,
    src/tools/get_mesh_tsdf_fusion.py:335-343)."""
    fx, fy, cx, cy = intrinsics
    depth_files = sorted(glob.glob(os.path.join(render_dir, "depth_*.npy")))
    assert depth_files, f"no renders found in {render_dir}"

    # scene bounds: backproject a sparse subset of rendered depths
    pts_lo = np.full(3, np.inf)
    pts_hi = np.full(3, -np.inf)
    for p in depth_files[:: max(len(depth_files) // 8, 1)]:
        idx = int(os.path.basename(p)[6:-4])
        depth = np.load(p)
        c2w = np.asarray(estimate_c2w_list[idx], np.float64)
        h, w = depth.shape
        jj, ii = np.meshgrid(np.arange(0, h, 4), np.arange(0, w, 4),
                             indexing="ij")
        d = depth[::4, ::4]
        ok = d > 0
        dirs = np.stack([(ii - cx) / fx, -(jj - cy) / fy,
                         -np.ones_like(ii, np.float64)], -1)
        pts = c2w[:3, 3] + (dirs @ c2w[:3, :3].T) * d[..., None]
        pts = pts[ok]
        if len(pts):
            pts_lo = np.minimum(pts_lo, pts.min(0))
            pts_hi = np.maximum(pts_hi, pts.max(0))

    vol = TSDFVolume.from_bounds(pts_lo, pts_hi, voxel, sdf_trunc,
                                 margin=bounds_margin,
                                 normal_weighting=normal_weighting)
    if verbose:
        print(f"TSDF grid {vol.dims} voxels @ {voxel:.4f} m")

    for i, p in enumerate(depth_files):
        idx = int(os.path.basename(p)[6:-4])
        depth = np.load(p)
        color = np.load(os.path.join(render_dir, f"color_{idx:05d}.npy"))
        # gate rendered depth by the sensor (get_mesh_tsdf_fusion.py:310-315)
        _, _, gt_depth, _ = dataset[idx]
        depth = depth.copy()
        depth[gt_depth == 0] = 0
        c2w = estimate_c2w_list[idx]
        vol.integrate(depth, np.clip(color, 0.0, 1.0), c2w, fx, fy, cx, cy)
        if verbose and i % 20 == 0:
            print(f"  integrated frame {idx}")
        if (mesh_freq > 0 and mid_mesh_dir is not None and i > 0
                and i % mesh_freq == 0):
            os.makedirs(mid_mesh_dir, exist_ok=True)
            verts, faces, colors = vol.extract_mesh(
                min_component_verts=100 if clean else None)
            mid_path = os.path.join(mid_mesh_dir,
                                    f"frame_{every * i}_mesh.ply")
            write_ply(mid_path, verts, faces, colors)
            if verbose:
                print(f"  saved intermediate mesh until frame {every * i}")
    return vol


def mesh_from_renders(slam, out_dir: str, mesh_path: str,
                      clean: Optional[bool] = None,
                      voxel: float = 5.0 / 512.0,
                      sdf_trunc: Optional[float] = None) -> str:
    cfg = slam.cfg
    cam = cfg["cam"]
    every = cfg["mapping"]["every_frame"]
    render_dir = os.path.join(out_dir, "rendered_every_frame")
    if not glob.glob(os.path.join(render_dir, "depth_*.npy")):
        from point_slam_tpu.tools.evaluate import rerender_frames
        rerender_frames(slam, out_dir, save_renders=True, eval_img=False)

    if sdf_trunc is None:
        # reference: trunc 0.04 m at voxel 5/512 (~4 voxels); keep the band
        # >= 4 voxels when a coarser grid is configured
        sdf_trunc = max(0.04, 4.0 * voxel)
    if clean is None:
        clean = cfg["dataset"] != "replica"
    vol = fuse_renders(render_dir, slam.dataset, slam.estimate_c2w_list,
                       every, (cam["fx"], cam["fy"], cam["cx"], cam["cy"]),
                       voxel=voxel, sdf_trunc=sdf_trunc,
                       verbose=cfg.get("verbose", True),
                       normal_weighting=cfg.get("meshing", {}).get(
                           "normal_weighting", False),
                       mesh_freq=cfg.get("meshing", {}).get("mesh_freq", -1),
                       mid_mesh_dir=os.path.join(
                           os.path.dirname(mesh_path), "mid_mesh"),
                       clean=clean)
    verts, faces, colors = vol.extract_mesh(
        min_component_verts=100 if clean else None)
    os.makedirs(os.path.dirname(mesh_path), exist_ok=True)
    np.save(os.path.join(os.path.dirname(mesh_path), "vertices_pos.npy"),
            verts)
    write_ply(mesh_path, verts, faces, colors)
    print(f"mesh written to {mesh_path} "
          f"({len(verts)} verts, {len(faces)} faces)")
    return mesh_path


def main():
    """Standalone reconstruct-from-checkpoint CLI (get_mesh_tsdf_fusion.py
    analog): rebuilds the SLAM state from the last checkpoint, re-renders
    every mapped frame, fuses and meshes."""
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--output", required=True)
    parser.add_argument("--name", default=None)
    parser.add_argument("--no_render", action="store_true",
                        help="reuse renders already in output dir")
    parser.add_argument("--clean", action="store_true")
    parser.add_argument("--voxel", type=float, default=5.0 / 512.0)
    # reference CLI surface (get_mesh_tsdf_fusion.py:161-187):
    parser.add_argument("--no_eval", action="store_true",
                        help="skip reconstruction eval after meshing")
    parser.add_argument("-s", "--silent", action="store_true")
    parser.add_argument("--exposure_avail", action="store_true",
                        help="accepted for reference-script compatibility; "
                             "exposure snapshots restore automatically from "
                             "the checkpoint when present")
    args = parser.parse_args()

    from point_slam_tpu.config import load_config
    from point_slam_tpu.slam import PointSLAM
    from point_slam_tpu.utils.logger import (
        load_checkpoint, restore_cloud_and_params,
        restore_color_decoder_snapshots)

    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cfg = load_config(args.config, os.path.join(here, "configs",
                                                "point_slam.yaml"))
    if args.silent:
        cfg["verbose"] = False
    slam = PointSLAM(cfg, output=args.output)
    ckpts = sorted(glob.glob(os.path.join(args.output, "ckpts", "*.npz")))
    assert ckpts, "no checkpoint found"
    ckpt = load_checkpoint(ckpts[-1])
    restore_cloud_and_params(ckpt, slam.mapper)
    restore_color_decoder_snapshots(ckpt, slam.mapper)
    if ckpt.get("exposure_feat_all") is not None and \
            ckpt["exposure_feat_all"].size:
        slam.mapper.exposure_feat_all = list(
            ckpt["exposure_feat_all"].astype(np.float32))
    n = min(len(ckpt["estimate_c2w_list"]), slam.n_img)
    slam.estimate_c2w_list[:n] = ckpt["estimate_c2w_list"][:n]
    slam.gt_c2w_list[:n] = ckpt["gt_c2w_list"][:n]

    scene = cfg.get("scene", "scene")
    name = args.name or f"{scene}_pred_mesh.ply"
    mesh_path = os.path.join(args.output, "mesh", name)
    if not args.no_render:
        from point_slam_tpu.tools.evaluate import rerender_frames
        rerender_frames(slam, args.output, save_renders=True, eval_img=False)
    mesh_from_renders(slam, args.output, mesh_path, clean=args.clean or None,
                      voxel=args.voxel)

    # post-mesh reconstruction eval (the reference's eval subprocess,
    # src/tools/get_mesh_tsdf_fusion.py:356-373); needs a GT mesh —
    # meshing.gt_mesh or the dataset's analytic one
    if not args.no_eval:
        from point_slam_tpu.tools.evaluate import eval_reconstruction
        has_gt = bool(cfg.get("meshing", {}).get("gt_mesh")) or \
            hasattr(slam.dataset, "gt_mesh")
        if has_gt:
            import json
            res = eval_reconstruction(slam, cfg, mesh_path, args.output)
            print(json.dumps({k: float(v) for k, v in res.items()},
                             indent=1))
            with open(os.path.join(args.output, "mesh",
                                   "recon_eval.json"), "w") as f:
                json.dump({k: float(v) for k, v in res.items()}, f, indent=1)
        elif not args.silent:
            print("no GT mesh configured (meshing.gt_mesh) -> skipping "
                  "reconstruction eval")


if __name__ == "__main__":
    main()
