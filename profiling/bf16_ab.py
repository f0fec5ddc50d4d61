"""A/B: f32 vs bf16 render view (tpu.bf16_features) at pipeline scale.

The bf16 view halves gather/scatter bytes in the hot loops but rounds the
features in the forward (pointcloud.encode_render). The tiny-scale CPU
probe (tests/test_bf16.py) showed a 2->8 mm tracking degradation from the
forward rounding at 48x64/15-iter scale — far below the shipped operating
point, so the decision needs THIS measurement: the 100-frame furnished
pipeline in the shipped pretrained_frozen regime, quality + wall-clock.

Flip tpu.bf16_features only if quality holds here (round-2 lesson: micros
and tiny configs lie in both directions).

Usage: python profiling/bf16_ab.py [n_frames]
"""
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import numpy as np


def run_variant(tag, n_frames, bf16):
    from point_slam_tpu.config import load_config
    from point_slam_tpu.slam import PointSLAM
    from point_slam_tpu.tools.evaluate import run_end_of_run_eval

    cfg = load_config(
        os.path.join(HERE, "configs", "Synthetic", "room_furnished.yaml"),
        os.path.join(HERE, "configs", "point_slam.yaml"))
    cfg["synthetic"]["n_frames"] = n_frames
    cfg["tpu"]["bf16_features"] = bf16
    cfg["reconstruction_datasets"] = ["synthetic"]
    cfg["render_datasets"] = ["synthetic"]
    cfg["rendering"]["eval_img"] = True
    cfg["meshing"]["eval_rec"] = True
    cfg["verbose"] = False
    out = os.path.join(HERE, "output", "bf16_ab", tag)
    cfg["data"]["output"] = out

    slam = PointSLAM(cfg)
    t0 = time.time()
    slam.run()
    wall = time.time() - t0
    res = run_end_of_run_eval(slam, out)
    row = {
        "variant": tag,
        "wall_s": round(wall, 1),
        "ate_cm": round(res.get("ate_rmse_no_align", float("nan")) * 100, 3),
        "fscore": round(res.get("recon_F_score", float("nan")), 2),
        "psnr": round(res.get("avg_psnr", float("nan")), 2),
        "ms_ssim": round(res.get("avg_ms_ssim", float("nan")), 4),
        "depth_l1_cm": round(res.get("depth_l1_render", float("nan")) * 100, 3),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    rows = [
        run_variant("f32", n_frames, False),
        run_variant("bf16", n_frames, True),
    ]
    print("\n| variant | wall s | ATE cm | F-score | PSNR | MS-SSIM | depth L1 cm |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['variant']} | {r['wall_s']} | {r['ate_cm']} | "
              f"{r['fscore']} | {r['psnr']} | {r['ms_ssim']} | "
              f"{r['depth_l1_cm']} |")
    os.makedirs(os.path.join(HERE, "output", "bf16_ab"), exist_ok=True)
    with open(os.path.join(HERE, "output", "bf16_ab", "results.json"),
              "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
