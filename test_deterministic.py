#!/usr/bin/env python
"""Golden-run determinism harness (reference: test_deterministic.py).

Runs a short SLAM sequence and compares the checkpoint's feature buffers and
trajectories bit-exactly against a stored reference npz. Without a stored
reference (or with --self_check), runs twice in-process and compares the two
runs — the invariant that makes refactors safe.

  python test_deterministic.py --self_check          # run twice, compare
  python test_deterministic.py --gen_ref             # write golden file
  python test_deterministic.py                       # compare vs golden
"""

import argparse
import os
import sys

# The golden file must be machine-independent: pin the harness to CPU so a
# refactor check never depends on (or hangs with) the remote-TPU tunnel.
# Run-to-run determinism ON the TPU is separately covered by the fixed-PRNG
# design; this harness guards refactors.
os.environ["JAX_PLATFORMS"] = "cpu"

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

GOLDEN = os.path.join(HERE, "tests", "golden", "determinism_ref.npz")
COMPARE_KEYS = ["geo_feats", "col_feats", "gt_c2w_list", "estimate_c2w_list"]


def run_once(n_frames=10):
    import numpy as np
    from point_slam_tpu.config import load_config
    from point_slam_tpu.slam import PointSLAM

    cfg = load_config(os.path.join(HERE, "configs", "Synthetic", "room.yaml"),
                      os.path.join(HERE, "configs", "point_slam.yaml"))
    cfg["synthetic"].update({"n_frames": n_frames, "angular_step": 0.02})
    cfg["cam"].update({"H": 48, "W": 64, "fx": 40.0, "fy": 40.0,
                       "cx": 31.5, "cy": 23.5})
    cfg["tracking"].update({"pixels": 300, "iters": 10,
                            "ignore_edge_W": 5, "ignore_edge_H": 5})
    cfg["mapping"].update({
        "pixels": 400, "pixels_adding": 200, "pixels_based_on_color_grad": 50,
        "iters": 20, "iters_first": 30, "geo_iter_first": 10,
        "mapping_window_size": 4, "keyframe_every": 4, "every_frame": 2,
        "color_refine": False, "vis_freq": 10_000,
    })
    cfg["tracking"]["vis_freq"] = 10_000
    cfg["tpu"].update({"point_capacity_init": 1 << 13,
                       "point_capacity_max": 1 << 16,
                       "grid_table_size": 1 << 14, "grid_max_per_cell": 64})
    cfg["verbose"] = False
    cfg["data"]["output"] = os.path.join("/tmp", "determinism_run")

    slam = PointSLAM(cfg)
    summary = slam.run(progress=False)
    n = int(slam.mapper.cloud.n_points)
    return {
        "geo_feats": np.asarray(slam.mapper.cloud.geo_feats[:n]),
        "col_feats": np.asarray(slam.mapper.cloud.col_feats[:n]),
        "gt_c2w_list": summary["gt_c2w_list"],
        "estimate_c2w_list": summary["estimate_c2w_list"],
    }


def compare(a, b, label_a="run1", label_b="run2"):
    import numpy as np
    ok = True
    for k in COMPARE_KEYS:
        if a[k].shape != b[k].shape:
            print(f"MISMATCH {k}: shapes {a[k].shape} vs {b[k].shape}")
            ok = False
        elif not np.array_equal(a[k], b[k]):
            d = np.abs(a[k].astype(np.float64) - b[k].astype(np.float64))
            print(f"MISMATCH {k}: max abs diff {d.max():.3e}")
            ok = False
        else:
            print(f"match    {k}: {a[k].shape} bit-exact")
    print(f"{'DETERMINISTIC' if ok else 'NON-DETERMINISTIC'} "
          f"({label_a} vs {label_b})")
    return ok


def main():
    import numpy as np
    parser = argparse.ArgumentParser()
    parser.add_argument("--gen_ref", action="store_true")
    parser.add_argument("--self_check", action="store_true")
    parser.add_argument("--n_frames", type=int, default=10)
    args = parser.parse_args()

    r1 = run_once(args.n_frames)
    if args.gen_ref:
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez_compressed(GOLDEN, **r1)
        print(f"golden reference written to {GOLDEN}")
        return
    if args.self_check or not os.path.exists(GOLDEN):
        if not args.self_check:
            print("no golden file; falling back to self-check (run twice)")
        r2 = run_once(args.n_frames)
        sys.exit(0 if compare(r1, r2) else 1)
    ref = dict(np.load(GOLDEN))
    sys.exit(0 if compare(r1, ref, "run", "golden") else 1)


if __name__ == "__main__":
    main()
