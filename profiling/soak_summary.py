"""Aggregate the ScanNet-scale soak run into committed evidence (VERDICT r3
#3): final n_points/keyframes, ATE aligned + no-align, PSNR/MS-SSIM,
F-score vs the analytic GT mesh, wall-clock (active compute vs wedge gaps),
device-memory stats from the at-scale eval, and the kill+resume record from
the watchdog log. Writes output/Synthetic/scannet_scale/soak_summary.json.

Usage:
    python profiling/soak_summary.py <run_dir> [--wedge-log /tmp/soak/soak.log]

The ATE numbers are recomputed here from the final checkpoint (not parsed
from logs) via tools/eval_ate; render/recon metrics are read from the eval
artifacts the at-scale eval writes into the run dir (rendered-metrics.json,
mesh/recon_eval.json) when present.
"""
import argparse
import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import numpy as np


def active_wall(metrics_path, gap_s=120.0):
    """Sum of inter-record deltas below gap_s (excludes wedge stalls and
    the kill/resume window); also returns the excluded gap total."""
    ts = []
    with open(metrics_path) as f:
        for line in f:
            try:
                ts.append(json.loads(line)["t"])
            except Exception:
                pass
    ts = np.asarray(sorted(ts))
    if len(ts) < 2:
        return 0.0, 0.0
    dt = np.diff(ts)
    return float(dt[dt < gap_s].sum()), float(dt[dt >= gap_s].sum())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--wedge-log", default="/tmp/soak/soak.log")
    args = ap.parse_args()
    run = args.run_dir.rstrip("/")

    ckpts = sorted(glob.glob(os.path.join(run, "ckpts", "*.npz")))
    assert ckpts, f"no checkpoints under {run}"
    z = np.load(ckpts[-1], allow_pickle=True)
    est = z["estimate_c2w_list"]
    gt = z["gt_c2w_list"]
    n_img = len(est)

    from point_slam_tpu.tools.eval_ate import evaluate_ate
    ate = evaluate_ate(gt, est, align=True)
    ate_na = evaluate_ate(gt, est, align=False)

    # per-kind frame timing from metrics.jsonl
    metrics_path = os.path.join(run, "metrics.jsonl")
    act, gaps = active_wall(metrics_path)
    final = {}
    with open(metrics_path) as f:
        for line in f:
            d = json.loads(line)
            if "final_n_points" in d:
                final = d

    # kill+resume evidence from the watchdog log
    resumes = []
    if os.path.exists(args.wedge_log):
        for line in open(args.wedge_log):
            if re.search(r"resume='--resume'|no log progress|wedged", line):
                resumes.append(line.strip())

    # eval artifacts written by the at-scale eval (mesher / render metrics)
    render = {}
    rm = os.path.join(run, "render_metrics.json")
    if os.path.exists(rm):
        render = json.load(open(rm))
    recon = {}
    rc = os.path.join(run, "mesh", "recon_eval.json")
    if os.path.exists(rc):
        recon = json.load(open(rc))
    mem = {}
    mm = os.path.join(run, "eval_memory.json")
    if os.path.exists(mm):
        mem = json.load(open(mm))

    cap_final = 1 << max(int(z["cloud_pos"].shape[0]) - 1, 1).bit_length()
    out = {
        "run_dir": run,
        "n_frames": int(n_img),
        "n_points": int(z["pts_num"]),
        "n_keyframes": int(len(z["keyframe_list"])),
        "point_capacity_final": cap_final,
        "packed_buffer_mb": round(cap_final * 72 * 4 / 1e6, 1),
        "keyframe_ring": "host",
        "ate_rmse_cm": round(
            ate["absolute_translational_error.rmse"] * 100, 3),
        "ate_rmse_noalign_cm": round(
            ate_na["absolute_translational_error.rmse"] * 100, 3),
        "ate_max_noalign_cm": round(
            ate_na["absolute_translational_error.max"] * 100, 3),
        "wall_active_s": round(act, 1),
        "wall_excluded_gaps_s": round(gaps, 1),
        "final_segment_timing": {k: round(v, 1) for k, v in final.items()
                                 if k.startswith("time_")},
        # accounting check (VERDICT r4 #6): the main-thread phase buckets
        # (track/map/wait/log/io/other) must sum to ~wall_active for runs
        # recorded after the round-5 attribution change; prefetch_* are
        # worker-side overlapped counters excluded from the sum. NOTE:
        # active_wall() spans ALL segments of a killed+resumed run while
        # final_segment_timing covers only the last segment, so compare
        # against time_wall_active when present.
        "timing_accounting": (lambda phases: {
            "phase_sum_s": round(sum(phases.values()), 1),
            # null (not NaN — invalid strict JSON) when the segment
            # predates the round-5 wall_active attribution
            "segment_wall_s": (round(final["time_wall_active"], 1)
                               if "time_wall_active" in final else None),
            "unattributed_s": (round(final["time_wall_active"]
                                     - sum(phases.values()), 1)
                               if "time_wall_active" in final else None),
            "note": ("pre-round-5 segment: only track/map/io were "
                     "attributed" if "time_wait" not in final else
                     "buckets: track/map/io/wait/log/other"),
        })({k: v for k, v in final.items()
            if k.startswith("time_") and not k.startswith("time_prefetch")
            and k != "time_wall_active"}),
        "final_memory": {k: final[k] for k in final
                         if k.startswith("mem_")},
        "render_metrics": render,
        "recon_eval": recon,
        "eval_memory": mem,
        "kill_resume_log": resumes,
        "checkpoints": [os.path.basename(c) for c in ckpts],
    }
    dst = os.path.join(os.path.dirname(run), "soak_summary.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    print("written:", dst)


if __name__ == "__main__":
    main()
