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
    python profiling/quality_gate.py --check     # staleness audit only
    QG_TPU_OVERRIDES='{"mlp_precision": "default"}' \
        python profiling/quality_gate.py 100 mlp_default

Staleness (VERDICT r4 #4): a standing gate certifies the product code of
the commit it ran at. The script refuses to UPDATE the standing file from
a dirty tree (QG_ALLOW_DIRTY=1 overrides, for probes only), and
``--check`` audits every committed output/quality_gate*.json: fails when a
gate carries a -dirty/unknown tag or when product code (point_slam_tpu/,
native/, run.py, configs/) changed between its commit and HEAD —
evidence-only commits (output/, docs, profiling/) don't invalidate a gate.

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


PRODUCT_PATHS = ["point_slam_tpu", "native", "run.py", "configs"]


def product_dirty(cwd=HERE) -> bool:
    """True when PRODUCT code (point_slam_tpu/, native/, run.py, configs/)
    has uncommitted changes. Evidence files (output/, docs, profiling/) a
    previous gate or bench just wrote never block a standing run — the
    same scope --check uses for staleness."""
    r = subprocess.run(["git", "status", "--porcelain", "--",
                        *PRODUCT_PATHS],
                       cwd=cwd, capture_output=True, text=True)
    return bool(r.stdout.strip())


def check_stale() -> int:
    """Audit committed gate files for staleness vs HEAD product code."""
    import glob
    fails = []
    for path in sorted(glob.glob(os.path.join(HERE, "output",
                                              "quality_gate*.json"))):
        row = json.load(open(path))
        c = str(row.get("commit", "")).replace("-dirty", "")
        name = os.path.basename(path)
        # A/B PROBES (tag given without --standing) are historical
        # evidence, not certifications — only STANDING gates are audited.
        # Legacy rows predate the "standing" field: the two canonical
        # standing files are audited, anything else tagged is a probe.
        standing = row.get("standing",
                           name in ("quality_gate.json",
                                    "quality_gate_sensor.json"))
        if not standing:
            print(f"probe (not audited): {name} "
                  f"[{row.get('commit')}, tag={row.get('tag')!r}]")
            continue
        if row.get("commit", "").endswith("-dirty") or c in ("", "unknown"):
            fails.append(f"{name}: dirty/unknown commit tag "
                         f"{row.get('commit')!r}")
            continue
        r = subprocess.run(
            ["git", "diff", "--name-only", f"{c}..HEAD", "--",
             *PRODUCT_PATHS], cwd=HERE, capture_output=True, text=True)
        if r.returncode != 0:
            fails.append(f"{name}: unknown commit {c}")
            continue
        changed = r.stdout.strip().splitlines()
        if changed:
            fails.append(f"{name}: product code changed since {c}: "
                         f"{changed[:5]}{'...' if len(changed) > 5 else ''}")
    for f in fails:
        print("STALE:", f)
    if not fails:
        print("all committed gate files certify HEAD product code")
    return 2 if fails else 0


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("n_frames", nargs="?", type=int, default=100)
    ap.add_argument("tag", nargs="?", default="")
    ap.add_argument("--check", action="store_true",
                    help="staleness audit of committed gate files, no run")
    ap.add_argument("--config",
                    default="configs/Synthetic/room_furnished.yaml",
                    help="gate scene config (e.g. room_sensor.yaml for the "
                         "TUM/ScanNet-shaped standing gate)")
    ap.add_argument("--standing", action="store_true",
                    help="with a tag: write quality_gate_<tag>.json as its "
                         "own STANDING gate (no A/B compare against the "
                         "main gate)")
    args = ap.parse_args()
    if args.check:
        sys.exit(check_stale())
    n_frames = args.n_frames
    tag = args.tag

    import jax
    jax.config.update("jax_default_matmul_precision", "highest")  # as run.py
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(HERE, ".jax_cache"))
    from point_slam_tpu.config import load_config
    from point_slam_tpu.slam import PointSLAM
    from point_slam_tpu.tools.evaluate import run_end_of_run_eval

    cfg = load_config(
        os.path.join(HERE, args.config),
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
        # dirty = uncommitted PRODUCT code only (same scope as --check):
        # gate_main updating its own tracked quality_gate.json would
        # otherwise wedge gate_sensor right behind it.
        dirty = product_dirty()
    except Exception:
        commit, dirty = "unknown", True
    if dirty and (not tag or args.standing) \
            and not os.environ.get("QG_ALLOW_DIRTY"):
        sys.exit("refusing to update a STANDING gate from a dirty tree "
                 "(commit first, or set QG_ALLOW_DIRTY=1 / pass a tag for "
                 "an A/B probe)")

    slam = PointSLAM(cfg)
    t0 = time.time()
    summary = slam.run()
    wall = time.time() - t0
    res = run_end_of_run_eval(slam, slam.output)
    from point_slam_tpu.utils.memory import memory_report

    row = {
        "tag": tag or "gate",
        "standing": bool(args.standing or not tag),
        "config": args.config,
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
        "timing_s": {k: round(v, 1) for k, v in summary["timing"].items()},
        "memory": memory_report(),
    }
    print(json.dumps(row, indent=1), flush=True)

    gate_path = os.path.join(HERE, "output", "quality_gate.json")
    if tag:
        # A/B probe (or, with --standing, a second standing gate): write
        # next to the main gate, never overwrite it
        probe = os.path.join(HERE, "output", f"quality_gate_{tag}.json")
        with open(probe, "w") as f:
            json.dump(row, f, indent=1)
        if args.standing:
            print(f"standing gate updated: {probe}", flush=True)
        elif os.path.exists(gate_path):
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
