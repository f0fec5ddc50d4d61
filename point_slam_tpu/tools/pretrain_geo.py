"""Pretrain the geometry decoder on randomized procedural scenes.

Reference parity: the reference initializes MLP_geometry from NICE-SLAM's
pretrained middle decoder and freezes it for the whole run
(src/Point_SLAM.py:143-164; configs/point_slam.yaml fix_geo_decoder: True).
That .pt artifact cannot be fetched in this environment (no egress), so this
tool manufactures the equivalent artifact natively: it runs the full SLAM
mapper over K randomized synthetic scenes SEQUENTIALLY, warm-starting each
run's geometry decoder from the previous run's output (color decoder and
point features restart per scene), then writes the final geometry decoder in
the exact npz layout ``models.decoders.load_pretrained_geo`` consumes
(pts_linears.{i}.{weight,bias}, fc_c.{i}.{weight,bias},
output_linear.{weight,bias}, embedder._B).

Training across several scenes with different geometry/texture statistics
pushes the decoder toward the scene-independent feature->occupancy decoding
the NICE-SLAM middle decoder provides; freezing it afterwards
(fix_geo_decoder) then behaves as in the reference.

Scenes use GT poses (tracking.gt_camera): the artifact being trained is the
decoder, and pose noise only blurs its supervision.

Usage:
  JAX_PLATFORMS=cpu python -m point_slam_tpu.tools.pretrain_geo \
      --out pretrained/middle_fine.npz --scenes 4 --frames 40
"""

from __future__ import annotations

import argparse
import copy
import os
import sys
import tempfile
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def save_geo_npz(geo_params, path: str) -> int:
    """Write a geometry-decoder pytree in load_pretrained_geo's npz layout.

    Weights go out in torch Linear layout (out, in) — the loader transposes
    back — so the same file also round-trips through the NICE-SLAM converter
    path (tools/convert_pretrained.py produces this layout from the .pt).
    """
    out = {}
    for i, lin in enumerate(geo_params["pts_linears"]):
        out[f"pts_linears.{i}.weight"] = np.asarray(lin["w"]).T
        out[f"pts_linears.{i}.bias"] = np.asarray(lin["b"])
    for i, lin in enumerate(geo_params["fc_c"]):
        out[f"fc_c.{i}.weight"] = np.asarray(lin["w"]).T
        out[f"fc_c.{i}.bias"] = np.asarray(lin["b"])
    out["output_linear.weight"] = np.asarray(geo_params["output_linear"]["w"]).T
    out["output_linear.bias"] = np.asarray(geo_params["output_linear"]["b"])
    out["embedder._B"] = np.asarray(geo_params["embedder_B"])
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **out)
    return len(out)


def scene_cfg(k: int, frames: int, out_dir: str, warm_npz: str | None):
    """Randomized synthetic scene k: room size, furniture, texture all vary."""
    from point_slam_tpu.config import load_config
    cfg = load_config(os.path.join(HERE, "configs", "Synthetic", "room.yaml"),
                      os.path.join(HERE, "configs", "point_slam.yaml"))
    rng = np.random.default_rng(9000 + 77 * k)
    cfg["synthetic"].update({
        "n_frames": frames,
        "seed": int(rng.integers(1, 1 << 30)),
        "objects": int(rng.integers(4, 10)),
        "texture_freq": float(rng.uniform(1.0, 2.5)),
        "texture_detail": float(rng.uniform(0.1, 0.35)),
        "half_extent": [float(rng.uniform(2.2, 3.6)),
                        float(rng.uniform(1.8, 2.6)),
                        float(rng.uniform(2.0, 3.0))],
    })
    # decoder supervision quality is set by mapping iterations, not image
    # size; a small camera keeps CPU pretraining tractable
    cfg["cam"].update({"H": 150, "W": 200, "fx": 125.0, "fy": 125.0,
                       "cx": 99.5, "cy": 74.5})
    cfg["tracking"]["gt_camera"] = True
    cfg["mapping"].update({
        "fix_geo_decoder": False,
        "fix_geo_decoder_after": 0,
        "every_frame": 4,
        "keyframe_every": 8,
        "mapping_window_size": 6,
        "pixels": 2500,
        "pixels_adding": 3000,
        "pixels_based_on_color_grad": 500,
        "iters": 150,
        "iters_first": 500,
        "geo_iter_first": 200,
        "lazy_start": 4,
        "ckpt_freq": 0,
        "color_refine": False,
    })
    cfg["verbose"] = False
    cfg["data"]["output"] = os.path.join(out_dir, f"scene_{k}")
    # warm-start the geometry decoder from the previous scene's output
    cfg["pretrained_decoders"] = {"middle_fine": warm_npz or ""}
    return cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(HERE, "pretrained",
                                                  "middle_fine.npz"))
    ap.add_argument("--scenes", type=int, default=4)
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--workdir", default="")
    args = ap.parse_args()

    from point_slam_tpu.slam import PointSLAM

    workdir = args.workdir or tempfile.mkdtemp(prefix="pretrain_geo_")
    warm = None
    for k in range(args.scenes):
        cfg = scene_cfg(k, args.frames, workdir, warm)
        t0 = time.time()
        slam = PointSLAM(cfg)
        slam.run(progress=False)
        geo = slam.mapper.params["geo"]
        warm = os.path.join(workdir, f"geo_after_scene_{k}.npz")
        n = save_geo_npz(geo, warm)
        print(f"[pretrain] scene {k}: {cfg['synthetic']['n_frames']} frames, "
              f"{time.time() - t0:.0f}s, {n} arrays -> {warm}", flush=True)
        del slam

    save_geo_npz_path = args.out
    import shutil
    os.makedirs(os.path.dirname(os.path.abspath(save_geo_npz_path)),
                exist_ok=True)
    shutil.copyfile(warm, save_geo_npz_path)
    print(f"[pretrain] final geometry decoder -> {save_geo_npz_path}")


if __name__ == "__main__":
    sys.exit(main())
