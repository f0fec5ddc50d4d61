"""Export AlexNet-LPIPS weights to npz for the pure-JAX metric.

The reference evaluates LPIPS through torchmetrics (src/Mapper.py:822-824,
866-870), which downloads AlexNet + calibration weights from the torch model
zoo — impossible in a zero-egress environment. Run this tool once wherever
the `lpips` (or torchmetrics) package is installed to produce
`weights/lpips_alex.npz`; utils/metrics.lpips then evaluates the metric
natively in JAX on TPU.

    python -m point_slam_tpu.tools.convert_lpips --out weights/lpips_alex.npz

Weight layout (all float32):
    shift, scale                    (3,)   input normalization
    conv{0..4}_w, conv{0..4}_b      AlexNet feature convs
    lin{0..4}_w                     non-negative 1x1 calibration weights
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def from_lpips_package():
    import lpips as lpips_pkg  # richzhang/PerceptualSimilarity
    m = lpips_pkg.LPIPS(net="alex", spatial=False)
    sd = {k: v.detach().cpu().numpy() for k, v in m.state_dict().items()}
    out = {
        "shift": sd["scaling_layer.shift"].reshape(3),
        "scale": sd["scaling_layer.scale"].reshape(3),
    }
    # alexnet features: conv layers sit at indices 0, 3, 6, 8, 10
    for i, idx in enumerate([0, 3, 6, 8, 10]):
        out[f"conv{i}_w"] = sd[f"net.slice{i + 1}.{idx}.weight"]
        out[f"conv{i}_b"] = sd[f"net.slice{i + 1}.{idx}.bias"]
    for i in range(5):
        out[f"lin{i}_w"] = np.maximum(
            sd[f"lin{i}.model.1.weight"].reshape(-1), 0.0)
    return out


def from_torchmetrics():
    from torchmetrics.image.lpip import LearnedPerceptualImagePatchSimilarity
    m = LearnedPerceptualImagePatchSimilarity(net_type="alex")
    sd = {k: v.detach().cpu().numpy() for k, v in m.net.state_dict().items()}
    out = {
        "shift": sd["scaling_layer.shift"].reshape(3),
        "scale": sd["scaling_layer.scale"].reshape(3),
    }
    for i, idx in enumerate([0, 3, 6, 8, 10]):
        out[f"conv{i}_w"] = sd[f"net.slice{i + 1}.{idx}.weight"]
        out[f"conv{i}_b"] = sd[f"net.slice{i + 1}.{idx}.bias"]
    for i in range(5):
        out[f"lin{i}_w"] = np.maximum(
            sd[f"lin{i}.model.1.weight"].reshape(-1), 0.0)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="weights/lpips_alex.npz")
    args = ap.parse_args()
    try:
        out = from_lpips_package()
        src = "lpips package"
    except Exception:
        out = from_torchmetrics()
        src = "torchmetrics"
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez(args.out, **{k: v.astype(np.float32) for k, v in out.items()})
    print(f"wrote {args.out} from {src}: "
          f"{sorted(out)} ({sum(v.size for v in out.values())} params)")


if __name__ == "__main__":
    main()
