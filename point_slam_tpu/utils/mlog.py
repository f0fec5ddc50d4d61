"""Experiment metrics sink: JSONL always, wandb when enabled and installed.

The reference logs scalars/images to wandb from both processes (SURVEY §5);
here a single MetricsLogger writes an append-only metrics.jsonl (machine
readable, survives crashes) and mirrors to wandb if cfg['wandb'] is set and
the package exists (it is not part of this image).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, output_dir: str, cfg: Optional[Dict[str, Any]] = None,
                 name: str = "run"):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "metrics.jsonl")
        self._fh = open(self.path, "a")
        self._wandb = None
        if cfg and cfg.get("wandb"):
            try:
                import wandb
                self._wandb = wandb
                wandb.init(project=cfg.get("project_name", "point_slam_tpu"),
                           name=name, config=cfg,
                           dir=cfg.get("wandb_folder", output_dir))
            except Exception:
                self._wandb = None

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None) -> None:
        rec = {"t": time.time(), **metrics}
        if step is not None:
            rec["step"] = step
        self._fh.write(json.dumps(rec, default=float) + "\n")
        self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_image(self, name: str, path: str,
                  step: Optional[int] = None) -> None:
        """Mirror an on-disk image artifact (vis panel, rendered frame) to
        wandb (the reference's per-panel ``wandb.log({...: wandb.Image})``,
        src/utils/Visualizer.py:55-61). The file itself is the primary
        artifact; this is a pure mirror and a no-op without wandb."""
        if self._wandb is not None and path:
            try:
                self._wandb.log({name: self._wandb.Image(path)}, step=step)
            except Exception:
                pass

    def log_points(self, name: str, positions, colors=None,
                   step: Optional[int] = None) -> None:
        """Mirror a point cloud to wandb as Object3D (the reference's
        ``wandb.Object3D`` dumps, src/Mapper.py:770-772). positions (N,3)
        float; colors (N,3) in [0,255] optional."""
        if self._wandb is None:
            return
        try:
            import numpy as np
            pos = np.asarray(positions, np.float32)
            if colors is not None:
                pts = np.hstack([pos, np.asarray(colors, np.float32)])
            else:
                pts = pos
            self._wandb.log({name: self._wandb.Object3D(pts)}, step=step)
        except Exception:
            pass

    def finish(self) -> None:
        self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()
