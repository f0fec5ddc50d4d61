#!/usr/bin/env python
"""CLI entry point: python run.py <config.yaml> [--input_folder ... --output ...
--wandb/--no_wandb --stop N].

Surface parity with the reference run.py (run.py:10-43). --stop N truncates
the sequence to N+1 frames and shortens ckpt/keyframe cadence for short
deterministic runs.
"""

import argparse
import os
import sys
from datetime import datetime

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)


def main():
    parser = argparse.ArgumentParser(description="point_slam_tpu runner")
    parser.add_argument("config", type=str, help="path to scene config yaml")
    parser.add_argument("--input_folder", type=str, default=None)
    parser.add_argument("--output", type=str, default=None)
    parser.add_argument("--wandb", action="store_true")
    parser.add_argument("--no_wandb", action="store_true")
    parser.add_argument("--stop", type=lambda s: None if s == "None" else int(s),
                        default=None, help="stop after n frames")
    parser.add_argument("--no_eval", action="store_true",
                        help="skip the end-of-run evaluation pipeline")
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest checkpoint in the "
                             "output dir (true mid-run resume)")
    args = parser.parse_args()

    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(HERE, ".jax_cache"))

    from point_slam_tpu.config import load_config
    from point_slam_tpu.slam import PointSLAM

    cfg = load_config(args.config, os.path.join(HERE, "configs", "point_slam.yaml"))
    if args.wandb:
        cfg["wandb"] = True
    if args.no_wandb:
        cfg["wandb"] = False
    if args.stop:
        cfg["mapping"]["ckpt_freq"] = args.stop
        cfg["mapping"]["keyframe_every"] = 10

    out = cfg["data"]["output"]
    if args.output:
        out = args.output
    if args.stop is None and not args.resume:
        out = os.path.join(out, datetime.now().strftime("%Y%m%d_%H%M%S"))

    resume_from = None
    if args.resume:
        import glob
        ckpts = sorted(glob.glob(os.path.join(out, "ckpts", "*.npz")))
        if not ckpts:
            # fresh full runs write under a timestamped subdir; resume the
            # newest one that has checkpoints
            nested = sorted(glob.glob(os.path.join(out, "*", "ckpts", "*.npz")))
            if nested:
                resume_from = nested[-1]
                out = os.path.dirname(os.path.dirname(resume_from))
            else:
                raise SystemExit(f"--resume: no checkpoint found under {out}")
        else:
            resume_from = ckpts[-1]

    slam = PointSLAM(cfg, input_folder=args.input_folder, output=out)
    summary = slam.run(stop=args.stop, resume_from=resume_from)
    print(f"finished {summary['n_frames']} frames, "
          f"{summary['n_points']} neural points, timing {summary['timing']}")

    import time
    from point_slam_tpu.utils.logger import save_checkpoint
    t0 = time.perf_counter()
    ckpt_path = os.path.join(out, "ckpts",
                             f"{summary['n_frames'] - 1:05d}.npz")
    save_checkpoint(ckpt_path, slam, idx=summary["n_frames"] - 1)
    print(f"checkpoint saved to {ckpt_path} "
          f"({time.perf_counter() - t0:.1f}s)")
    slam.mlog.log({"time_ckpt_final": time.perf_counter() - t0})

    if not args.no_eval:
        from point_slam_tpu.tools.evaluate import run_end_of_run_eval
        t0 = time.perf_counter()
        run_end_of_run_eval(slam, out)
        # eval wall goes to the sink so post-run accounting
        # (soak_summary's final_segment_timing) sums with the SLAM phases
        slam.mlog.log({"time_eval": time.perf_counter() - t0})


if __name__ == "__main__":
    main()
