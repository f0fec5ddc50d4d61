"""At-scale eval from the ScanNet-scale soak checkpoint (VERDICT r3 #3).

Loads the final soak checkpoint (5,000 frames / ~111k points / 500
keyframes), then runs the full end-of-run quality pipeline that the soak's
config did not enable inline: re-render every mapped frame with the
per-frame color-decoder snapshots + exposure features (eval_img=True ->
PSNR/MS-SSIM/depth-L1), TSDF-fuse + mesh, F-score vs the analytic GT mesh,
and record device memory stats at scale. Writes render_metrics.json,
mesh/recon_eval.json and eval_memory.json into the run dir — the inputs
profiling/soak_summary.py aggregates.

Usage: python profiling/soak_eval.py <run_dir> [render_stride]

render_stride (default 1) evaluates every stride-th mapped frame; at 1000
mapped frames a full sweep costs ~1 h of device time, so the queued soak
eval uses a stride and records it in render_metrics.json.
"""
import glob
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import numpy as np


def main():
    run = sys.argv[1].rstrip("/")
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")  # as run.py
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(HERE, ".jax_cache"))

    from point_slam_tpu.config import load_config
    from point_slam_tpu.slam import PointSLAM
    from point_slam_tpu.utils.logger import (
        load_checkpoint, restore_cloud_and_params,
        restore_color_decoder_snapshots)
    from point_slam_tpu.tools.evaluate import (rerender_frames,
                                               eval_reconstruction)
    from point_slam_tpu.tools.mesher import mesh_from_renders

    cfg_path = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        HERE, "configs", "Synthetic", "room_scannet_scale.yaml")
    cfg = load_config(cfg_path, os.path.join(HERE, "configs", "point_slam.yaml"))
    cfg["verbose"] = True
    slam = PointSLAM(cfg, output=run)
    ckpts = sorted(glob.glob(os.path.join(run, "ckpts", "*.npz")))
    assert ckpts, f"no checkpoints under {run}"
    print("loading", ckpts[-1], flush=True)
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

    print(f"restored: {slam.mapper.n_points_host} points, "
          f"{len(slam.mapper.color_decoder_snapshots)} color snapshots, "
          f"{len(slam.mapper.exposure_feat_all)} exposure feats", flush=True)

    stride = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    rr = rerender_frames(slam, run, save_renders=True, eval_img=True,
                         stride=stride)
    rr = {k: (float(v) if isinstance(v, (int, float, np.floating)) else v)
          for k, v in rr.items()}
    rr["render_stride"] = stride
    with open(os.path.join(run, "render_metrics.json"), "w") as f:
        json.dump(rr, f, indent=1)
    print("render_metrics:", rr, flush=True)

    # capture memory right after the re-render (the cloud + keyframe state
    # plus render scratch is the at-scale device working set); fall back to
    # the live-buffer sum where memory_stats() is unsupported (this image)
    from point_slam_tpu.utils.memory import memory_report
    mem = dict(memory_report())

    mesh_path = os.path.join(run, "mesh", "final_mesh.ply")
    mesh_from_renders(slam, run, mesh_path,
                      voxel=cfg["meshing"].get("voxel", 5.0 / 512.0))
    cfg["meshing"]["eval_rec"] = True
    rec = eval_reconstruction(slam, cfg, mesh_path, run)
    rec = {k: float(v) for k, v in rec.items()}
    # the mesh is fused from only every stride-th mapped frame's renders:
    # record the fusion subsample next to the F-score so strided runs are
    # never silently compared against full-fusion ones
    rec["render_stride"] = stride
    rec["n_fused_frames"] = int(rr.get("frame_cnt", 0))
    with open(os.path.join(run, "mesh", "recon_eval.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print("recon_eval:", rec, flush=True)

    mem.update({f"post_mesh_{k}": v for k, v in memory_report().items()})
    with open(os.path.join(run, "eval_memory.json"), "w") as f:
        json.dump(mem, f, indent=1)
    print("eval_memory:", {k: mem[k] for k in sorted(mem)[:8]}, flush=True)


if __name__ == "__main__":
    main()
