"""Per-round quality gate: ONE command, committed evidence.

Runs the 100-frame furnished synthetic scene end-to-end (SLAM -> re-render
-> TSDF mesh -> reconstruction eval) and writes every headline quality
metric (ATE aligned/no-align, F-score, precision/recall, PSNR, MS-SSIM,
rendered-depth L1) plus the commit hash and any tpu-knob overrides to
``output/quality_gate.json``. Every perf change quotes before/after from
this file (VERDICT r3 #4); the reference analog is the end-of-run eval
pipeline, /root/reference/src/Mapper.py:793-931.

Usage:
    python profiling/quality_gate.py [n_frames] [tag]
    QG_TPU_OVERRIDES='{"mlp_precision": "default"}' \
        python profiling/quality_gate.py 100 mlp_default

Gate (round-4 thresholds, from VERDICT r3 task 1): ATE no-align <= 0.4 cm
at bench scale maps to <= 0.25 cm here; F-score within 0.5 of the standing
gate value recorded in output/quality_gate.json. The script prints
PASS/FAIL against the standing file when one exists and the run is
untagged (tagged runs are A/B probes, not gate updates).
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    tag = sys.argv[2] if len(sys.argv) > 2 else ""

    import jax
    jax.config.update("jax_default_matmul_precision", "highest")  # as run.py
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(HERE, ".jax_cache"))
    from point_slam_tpu.config import load_config
    from point_slam_tpu.slam import PointSLAM
    from point_slam_tpu.tools.evaluate import run_end_of_run_eval

    cfg = load_config(
        os.path.join(HERE, "configs", "Synthetic", "room_furnished.yaml"),
        os.path.join(HERE, "configs", "point_slam.yaml"))
    cfg["synthetic"]["n_frames"] = n_frames
    overrides = json.loads(os.environ.get("QG_TPU_OVERRIDES", "{}"))
    if overrides:
        print(f"tpu overrides: {overrides}", flush=True)
        cfg["tpu"].update(overrides)
    cfg["reconstruction_datasets"] = ["synthetic"]
    cfg["render_datasets"] = ["synthetic"]
    cfg["rendering"]["eval_img"] = True
    cfg["meshing"]["eval_rec"] = True
    cfg["verbose"] = False
    out = os.path.join(HERE, "output", "quality_gate" + ("_" + tag if tag
                                                         else ""))
    cfg["data"]["output"] = out

    try:
        commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                                cwd=HERE, capture_output=True,
                                text=True).stdout.strip()
        dirty = bool(subprocess.run(["git", "status", "--porcelain"],
                                    cwd=HERE, capture_output=True,
                                    text=True).stdout.strip())
    except Exception:
        commit, dirty = "unknown", True

    slam = PointSLAM(cfg)
    t0 = time.time()
    slam.run()
    wall = time.time() - t0
    res = run_end_of_run_eval(slam, slam.output)

    row = {
        "tag": tag or "gate",
        "commit": commit + ("-dirty" if dirty else ""),
        "backend": jax.default_backend(),
        "n_frames": n_frames,
        "tpu_overrides": overrides,
        "wall_s": round(wall, 1),
        "n_points": int(slam.mapper.n_points_host),
        "ate_cm": round(res.get("ate_rmse", float("nan")) * 100, 3),
        "ate_noalign_cm": round(
            res.get("ate_rmse_no_align", float("nan")) * 100, 3),
        "fscore": round(res.get("recon_F_score", float("nan")), 2),
        "precision": round(res.get("recon_precision", float("nan")), 2),
        "recall": round(res.get("recon_recall", float("nan")), 2),
        "psnr": round(res.get("avg_psnr", float("nan")), 2),
        "ms_ssim": round(res.get("avg_ms_ssim", float("nan")), 4),
        "lpips": res.get("avg_lpips"),
        "depth_l1_cm": round(
            res.get("depth_l1_render", float("nan")) * 100, 3),
    }
    print(json.dumps(row, indent=1), flush=True)

    gate_path = os.path.join(HERE, "output", "quality_gate.json")
    if tag:
        # A/B probe: write next to the gate, never overwrite it
        probe = os.path.join(HERE, "output", f"quality_gate_{tag}.json")
        with open(probe, "w") as f:
            json.dump(row, f, indent=1)
        if os.path.exists(gate_path):
            with open(gate_path) as f:
                gate = json.load(f)
            ok = (row["ate_noalign_cm"] <= max(0.25, 1.1 * gate[
                "ate_noalign_cm"])
                  and row["fscore"] >= gate["fscore"] - 0.5)
            print(f"vs standing gate ({gate['commit']}): "
                  f"{'PASS' if ok else 'FAIL'} "
                  f"(ATE {gate['ate_noalign_cm']} -> {row['ate_noalign_cm']}"
                  f" cm, F {gate['fscore']} -> {row['fscore']})", flush=True)
            sys.exit(0 if ok else 3)
    else:
        with open(gate_path, "w") as f:
            json.dump(row, f, indent=1)
        print(f"standing gate updated: {gate_path}", flush=True)


if __name__ == "__main__":
    main()
