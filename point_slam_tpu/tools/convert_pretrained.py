"""Convert the NICE-SLAM pretrained middle/fine decoder checkpoint to npz.

The reference warm-starts its geometry decoder from pretrained/middle_fine.pt
(src/Point_SLAM.py:143-164): keys under 'model' matching
'decoder*middle*' (minus the prefix) load into MLP_geometry with
strict=False. This tool extracts that middle-decoder subset into the npz
layout consumed by models.decoders.load_pretrained_geo.

Usage: python -m point_slam_tpu.tools.convert_pretrained \
           pretrained/middle_fine.pt pretrained/middle_fine.npz
"""

from __future__ import annotations

import argparse

import numpy as np


def convert(src: str, dst: str) -> int:
    import torch
    ckpt = torch.load(src, map_location="cpu", weights_only=False)
    middle = {}
    for key, val in ckpt["model"].items():
        if "decoder" in key and "encoder" not in key and "coarse" in key:
            middle[key[8 + 7:]] = val.numpy()
    out = {}
    for k, v in middle.items():
        out[k] = np.asarray(v)
    np.savez(dst, **out)
    return len(out)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("src")
    parser.add_argument("dst")
    args = parser.parse_args()
    n = convert(args.src, args.dst)
    print(f"wrote {n} arrays to {args.dst}")


if __name__ == "__main__":
    main()
