"""Absolute trajectory error (ATE) with Horn closed-form SE(3) alignment.

Own implementation of the classic TUM RGB-D benchmark evaluation the
reference vendors (src/tools/eval_ate.py:44-110,218-226): zero-center both
trajectories, SVD of the correlation with a det-correction reflection guard,
then RMSE/mean/median/std/min/max of the translational residuals.

Usable as a library (evaluate_ate) and as a CLI over a checkpoint npz
(mirroring `python src/tools/eval_ate.py <cfg> --output out [--no_align]`,
which the reference invokes via subprocess, src/Mapper.py:795-803).
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Dict

import numpy as np


def horn_align(model: np.ndarray, data: np.ndarray):
    """Least-squares rigid alignment model -> data. Inputs (3, n).

    Returns (rot (3,3), trans (3,1), trans_error (n,)).
    """
    model_mean = model.mean(axis=1, keepdims=True)
    data_mean = data.mean(axis=1, keepdims=True)
    model_zc = model - model_mean
    data_zc = data - data_mean
    w = model_zc @ data_zc.T
    u, _, vh = np.linalg.svd(w.T)
    s = np.eye(3)
    if np.linalg.det(u) * np.linalg.det(vh) < 0:
        s[2, 2] = -1
    rot = u @ s @ vh
    trans = data_mean - rot @ model_mean
    aligned = rot @ model + trans
    err = np.sqrt(np.sum((aligned - data) ** 2, axis=0))
    return rot, trans, err


def pose_translations(c2w_list: np.ndarray) -> np.ndarray:
    return np.asarray(c2w_list)[:, :3, 3].T  # (3, n)


def evaluate_ate(gt_c2w_list, est_c2w_list, align: bool = True
                 ) -> Dict[str, float]:
    gt = np.asarray(gt_c2w_list, np.float64)
    est = np.asarray(est_c2w_list, np.float64)
    ok = np.isfinite(gt.reshape(len(gt), -1)).all(1) & \
        np.isfinite(est.reshape(len(est), -1)).all(1)
    model = pose_translations(est[ok])
    data = pose_translations(gt[ok])
    if align:
        _, _, err = horn_align(model, data)
    else:
        err = np.sqrt(np.sum((model - data) ** 2, axis=0))
    return {
        "compared_pose_pairs": int(ok.sum()),
        "absolute_translational_error.rmse": float(np.sqrt(np.mean(err ** 2))),
        "absolute_translational_error.mean": float(np.mean(err)),
        "absolute_translational_error.median": float(np.median(err)),
        "absolute_translational_error.std": float(np.std(err)),
        "absolute_translational_error.min": float(np.min(err)),
        "absolute_translational_error.max": float(np.max(err)),
    }


def plot_traj(gt_c2w_list, est_c2w_list, path: str) -> None:
    """Save a top-down (x-y) trajectory comparison plot.

    Parity: src/tools/eval_ate.py:81-110,183-216 (ground truth vs estimate
    with per-pose difference segments).
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    gt = np.asarray(gt_c2w_list, np.float64)
    est = np.asarray(est_c2w_list, np.float64)
    ok = np.isfinite(gt.reshape(len(gt), -1)).all(1) & \
        np.isfinite(est.reshape(len(est), -1)).all(1)
    g = pose_translations(gt[ok])
    e = pose_translations(est[ok])
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.plot(g[0], g[1], "-", color="black", label="ground truth")
    ax.plot(e[0], e[1], "-", color="blue", label="estimated")
    for i in range(0, g.shape[1]):
        ax.plot([g[0, i], e[0, i]], [g[1, i], e[1, i]],
                "-", color="red", alpha=0.3, linewidth=0.5,
                label="difference" if i == 0 else None)
    ax.legend()
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.set_aspect("equal", adjustable="datalim")
    fig.savefig(path, dpi=90)
    plt.close(fig)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config", nargs="?")
    parser.add_argument("--output", required=True)
    parser.add_argument("--no_align", action="store_true")
    parser.add_argument("--plot", default=None,
                        help="save a trajectory plot to this path")
    args = parser.parse_args()

    ckpt_dir = os.path.join(args.output, "ckpts")
    ckpts = sorted(p for p in os.listdir(ckpt_dir) if p.endswith(".npz"))
    if not ckpts:
        print("no checkpoints found", file=sys.stderr)
        sys.exit(1)
    data = np.load(os.path.join(ckpt_dir, ckpts[-1]))
    result = evaluate_ate(data["gt_c2w_list"], data["estimate_c2w_list"],
                          align=not args.no_align)
    if args.plot:
        plot_traj(data["gt_c2w_list"], data["estimate_c2w_list"], args.plot)
    print(result)


if __name__ == "__main__":
    main()
