"""End-to-end reconstruction validation on a synthetic scene:
SLAM -> TSDF mesh (mesher) -> F-score/depth-L1 vs the ANALYTIC GT mesh.

The synthetic scenes have exact analytic surfaces (Synthetic.gt_mesh:
room walls + interior furniture), so this closes the loop on the whole
reconstruction stack (render -> TSDF fuse -> marching -> eval_recon)
with a real metric and no GT uncertainty.

Usage: python profiling/recon_validate.py <run_cfg.yaml> [<output_dir>]
(defaults: /tmp/soak50.yaml and its latest run dir).
"""
import glob
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    cfg_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/soak50.yaml"
    if len(sys.argv) > 2:
        out = sys.argv[2]
    else:
        from point_slam_tpu.config import load_config
        cfg0 = load_config(cfg_path, os.path.join(HERE, "configs",
                                                  "point_slam.yaml"))
        runs = sorted(glob.glob(os.path.join(cfg0["data"]["output"], "*")))
        assert runs, f"no runs under {cfg0['data']['output']}"
        out = runs[-1]

    from point_slam_tpu.config import load_config
    from point_slam_tpu.datasets import get_dataset
    from point_slam_tpu.tools.cull_mesh import cull_mesh
    from point_slam_tpu.tools.eval_recon import calc_3d_metric
    from point_slam_tpu.utils.logger import load_checkpoint
    from point_slam_tpu.utils.ply import write_ply

    cfg = load_config(cfg_path, os.path.join(HERE, "configs",
                                             "point_slam.yaml"))
    ds = get_dataset(cfg)
    v, f = ds.gt_mesh()
    gt_path = "/tmp/gt_scene.ply"
    write_ply(gt_path, v, faces=f)
    print(f"GT analytic mesh: {len(v)} verts {len(f)} faces")

    rec = sorted(glob.glob(os.path.join(out, "mesh", "*.ply")))
    rec = [p for p in rec if "vertices" not in p]
    if not rec:
        print("building mesh from checkpoint via the mesher CLI...")
        r = subprocess.run(
            [sys.executable, "-m", "point_slam_tpu.tools.mesher",
             cfg_path, "--output", out, "--no_render"],
            cwd=HERE, capture_output=True, text=True)
        print(r.stdout[-500:], r.stderr[-300:])
        rec = [p for p in sorted(glob.glob(os.path.join(out, "mesh", "*.ply")))
               if "vertices" not in p]
    print("rec mesh:", rec[-1])

    res = calc_3d_metric(rec[-1], gt_path, threshold=0.01)
    print("3D recon metrics vs FULL GT (tau=1cm):", res)

    # the trajectory only observes part of the room — cull the GT mesh to
    # the observed frusta (the reference's cull_mesh step) for a fair score
    ck = load_checkpoint(sorted(glob.glob(os.path.join(out, "ckpts",
                                                       "*.npz")))[-1])
    poses = ck["estimate_c2w_list"]
    cam = cfg["cam"]
    cv, cf, _ = cull_mesh(v, f, poses, H=cam["H"], W=cam["W"], fx=cam["fx"],
                          fy=cam["fy"], cx=cam["cx"], cy=cam["cy"])
    gt_culled = "/tmp/gt_scene_culled.ply"
    write_ply(gt_culled, cv, faces=cf)
    print(f"culled GT: {len(cv)} verts {len(cf)} faces")
    res2 = calc_3d_metric(rec[-1], gt_culled, threshold=0.01)
    print("3D recon metrics vs CULLED GT (tau=1cm):", res2)


if __name__ == "__main__":
    main()
