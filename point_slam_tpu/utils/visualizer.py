"""Visualization: 2x3 GT/rendered/residual panels per frame.

Parity with src/utils/Visualizer.py: at a configurable frame/iteration
frequency, renders the full frame from the current estimate and writes a
panel image (depth row + color row) to <output>/<vis_dir>/, plus an optional
raw rendered-RGB png. Also exposes vis_value_only for the evaluation
re-render path.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from point_slam_tpu import renderer as R


class Visualizer:
    def __init__(self, freq: int, inside_freq: int, vis_dir: str,
                 verbose: bool = False, vis_inside: bool = False,
                 img_dir: Optional[str] = None):
        self.freq = max(freq, 1)
        self.inside_freq = max(inside_freq, 1)
        self.vis_dir = vis_dir
        self.img_dir = img_dir
        self.verbose = verbose
        self.vis_inside = vis_inside
        os.makedirs(vis_dir, exist_ok=True)
        if img_dir:
            os.makedirs(img_dir, exist_ok=True)

    def should_fire(self, idx: int, it: int, total_iters: int,
                    freq_override: bool = False) -> bool:
        if freq_override:
            return True
        if self.vis_inside:
            return idx % self.freq == 0 and it % self.inside_freq == 0
        return idx % self.freq == 0 and it == total_iters - 1

    def vis_chunk(self, idx: int, it_prev: int, it_now: int, total: int,
                  mapper, c2w, gt_depth, gt_color) -> Optional[str]:
        """vis_inside firing between optimization-loop chunks: fire once if
        a multiple of inside_freq lies in [it_prev, it_now) — the
        chunk-boundary analog of the reference's per-iteration
        ``joint_iter % vis_inside_freq == 0`` check (src/Mapper.py:441-445,
        src/Tracker.py:367-371)."""
        if not self.vis_inside or idx % self.freq != 0:
            return None
        m = (max(it_now, 1) - 1) // self.inside_freq * self.inside_freq
        if m < it_prev:
            return None
        return self.vis(idx, m, total, mapper, c2w, gt_depth, gt_color,
                        freq_override=True)

    def render_frame(self, mapper, c2w, gt_depth, gt_color, key=None,
                     r_query=None):
        cfg = mapper.cfg
        cam = cfg["cam"]
        if r_query is None:
            _, r_query, _, _ = mapper.radius_maps(jnp.asarray(gt_color))
        dep, unc, col = R.render_img(
            mapper.params, mapper.cloud, mapper.index, jnp.asarray(c2w),
            (cam["fx"], cam["fy"], cam["cx"], cam["cy"]),
            (cam["H"], cam["W"]), mapper.rc,
            key if key is not None else jax.random.key(0),
            jnp.asarray(gt_depth), r_query)
        return np.asarray(dep), np.asarray(unc), np.asarray(col)

    def vis_value_only(self, mapper, c2w, gt_depth, gt_color, key=None):
        dep, _, col = self.render_frame(mapper, c2w, gt_depth, gt_color, key)
        return dep, col

    def vis(self, idx: int, it: int, total_iters: int, mapper, c2w,
            gt_depth, gt_color, freq_override: bool = False,
            save_rendered_image: bool = False,
            r_query=None) -> Optional[str]:
        if not self.should_fire(idx, it, total_iters, freq_override):
            return None
        dep, unc, col = self.render_frame(mapper, c2w, gt_depth, gt_color,
                                          r_query=r_query)
        gt_depth = np.asarray(gt_depth)
        gt_color = np.asarray(gt_color)
        depth_res = np.abs(gt_depth - dep)
        depth_res[gt_depth == 0] = 0
        color_res = np.abs(gt_color - np.clip(col, 0, 1))
        color_res[gt_depth == 0] = 0

        vmax = max(float(gt_depth.max()), 1e-3)
        fig, axs = plt.subplots(2, 3, figsize=(12, 6))
        for ax in axs.ravel():
            ax.set_xticks([])
            ax.set_yticks([])
        axs[0, 0].imshow(gt_depth, cmap="plasma", vmin=0, vmax=vmax)
        axs[0, 0].set_title("sensor depth")
        axs[0, 1].imshow(dep, cmap="plasma", vmin=0, vmax=vmax)
        axs[0, 1].set_title("rendered depth")
        axs[0, 2].imshow(depth_res, cmap="plasma", vmin=0, vmax=vmax)
        axs[0, 2].set_title("depth residual")
        axs[1, 0].imshow(np.clip(gt_color, 0, 1))
        axs[1, 0].set_title("input rgb")
        axs[1, 1].imshow(np.clip(col, 0, 1))
        axs[1, 1].set_title("rendered rgb")
        axs[1, 2].imshow(np.clip(color_res, 0, 1))
        axs[1, 2].set_title("rgb residual")
        out = os.path.join(self.vis_dir, f"{idx:05d}_{it:04d}.jpg")
        plt.tight_layout()
        plt.savefig(out, dpi=90, bbox_inches="tight", pad_inches=0.1)
        plt.close(fig)

        if save_rendered_image and self.img_dir:
            import imageio.v2 as imageio
            imageio.imwrite(
                os.path.join(self.img_dir, f"frame_{idx:05d}.png"),
                (np.clip(col, 0, 1) * 255).astype(np.uint8))
        if self.verbose:
            print(f"saved visualization {out}")
        return out
