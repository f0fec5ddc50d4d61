"""A/B: auto-trained geometry decoder vs freeze-after-N-frames.

The reference freezes a PRETRAINED NICE-SLAM geometry decoder
(src/Point_SLAM.py:143-164, mapping.fix_geo_decoder). No pretrained weights
ship in this image, so the repo auto-trains the decoder (slam.py fallback).
This measures what the always-training choice costs/buys vs the closest
frozen analog — train for the first N mapped frames, then freeze
(mapping.fix_geo_decoder_after) — on the furnished synthetic scene with
ATE / F-score / PSNR as the scoreboard.

Both variants run in ONE process (the shared chip has ~20% cross-process
variance; quality metrics are deterministic but this also halves compile
time via the jit cache).

Usage: python profiling/geo_decoder_ab.py [n_frames] [freeze_after]
"""
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import numpy as np


def run_variant(tag, n_frames, fix_after, pretrained=""):
    import jax
    from point_slam_tpu.config import load_config
    from point_slam_tpu.slam import PointSLAM
    from point_slam_tpu.tools.evaluate import run_end_of_run_eval

    cfg = load_config(
        os.path.join(HERE, "configs", "Synthetic", "room_furnished.yaml"),
        os.path.join(HERE, "configs", "point_slam.yaml"))
    cfg["synthetic"]["n_frames"] = n_frames
    cfg["mapping"]["fix_geo_decoder_after"] = fix_after
    # explicit decoder regime per variant (the config default would
    # otherwise flip behavior depending on whether the pretrained npz
    # exists in the tree):
    #   pretrained="..." -> reference regime: load + freeze for the run
    #   pretrained=""    -> auto-train regime (optionally freeze at N)
    cfg["pretrained_decoders"] = {"middle_fine": pretrained}
    cfg["mapping"]["fix_geo_decoder"] = bool(pretrained)
    cfg["reconstruction_datasets"] = ["synthetic"]
    cfg["render_datasets"] = ["synthetic"]
    cfg["rendering"]["eval_img"] = True
    cfg["meshing"]["eval_rec"] = True
    cfg["verbose"] = False
    out = os.path.join(HERE, "output", "geo_ab", tag)
    cfg["data"]["output"] = out

    slam = PointSLAM(cfg)
    t0 = time.time()
    slam.run()
    wall = time.time() - t0
    res = run_end_of_run_eval(slam, out)
    row = {
        "variant": tag,
        "fix_after": fix_after,
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
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    freeze_after = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    rows = [
        run_variant("train_always", n_frames, 0),
        run_variant(f"freeze_after_{freeze_after}", n_frames, freeze_after),
    ]
    # reference regime: pretrained decoder loaded and frozen for the whole
    # run (src/Point_SLAM.py:143-164) — runs when the artifact exists
    # (tools/pretrain_geo.py produces it; override via PRETRAIN_NPZ)
    npz = os.environ.get(
        "PRETRAIN_NPZ", os.path.join(HERE, "pretrained", "middle_fine.npz"))
    if os.path.exists(npz):
        rows.append(run_variant("pretrained_frozen", n_frames, 0,
                                pretrained=npz))
    print("\n| variant | ATE cm | F-score | PSNR | MS-SSIM | depth L1 cm |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['variant']} | {r['ate_cm']} | {r['fscore']} | "
              f"{r['psnr']} | {r['ms_ssim']} | {r['depth_l1_cm']} |")
    with open(os.path.join(HERE, "output", "geo_ab", "results.json"),
              "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
