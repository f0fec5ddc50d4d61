"""Metrics-sink tests: JSONL always; wandb mirroring of scalars, images
and 3D point clouds when the package is importable (the reference logs all
three, src/Mapper.py:770-772, src/utils/Visualizer.py:55-61). wandb is not
part of this image, so the mirror is exercised against a stub module."""
import json
import os
import sys
import types

import numpy as np

from point_slam_tpu.utils.mlog import MetricsLogger


def _stub_wandb(calls):
    w = types.ModuleType("wandb")
    w.init = lambda **kw: calls.append(("init", kw))
    w.log = lambda d, step=None: calls.append(("log", d, step))
    w.finish = lambda: calls.append(("finish",))

    class Image:
        def __init__(self, path):
            self.path = path

    class Object3D:
        def __init__(self, pts):
            self.pts = np.asarray(pts)

    w.Image = Image
    w.Object3D = Object3D
    return w


def test_jsonl_always_and_noop_mirror_without_wandb(tmp_path):
    m = MetricsLogger(str(tmp_path), cfg=None)
    m.log({"a": 1.5}, step=3)
    # mirrors are no-ops without wandb — must not raise
    m.log_image("panel", str(tmp_path / "missing.jpg"), step=3)
    m.log_points("pc", np.zeros((4, 3)), np.zeros((4, 3)), step=3)
    m.finish()
    rec = json.loads(open(tmp_path / "metrics.jsonl").read().splitlines()[0])
    assert rec["a"] == 1.5 and rec["step"] == 3


def test_wandb_mirror_scalars_images_points(tmp_path, monkeypatch):
    calls = []
    monkeypatch.setitem(sys.modules, "wandb", _stub_wandb(calls))
    m = MetricsLogger(str(tmp_path), cfg={"wandb": True, "project_name": "p"})
    m.log({"x": 2.0}, step=1)

    img = tmp_path / "panel.jpg"
    img.write_bytes(b"\xff\xd8\xff")
    m.log_image("mapping_vis", str(img), step=1)
    m.log_image("mapping_vis", None, step=1)  # vis didn't fire -> no-op

    pos = np.arange(12, dtype=np.float32).reshape(4, 3)
    rgb = np.full((4, 3), 128.0, np.float32)
    m.log_points("input_pc", pos, rgb, step=1)
    m.finish()

    kinds = [c[0] for c in calls]
    assert kinds[0] == "init" and kinds[-1] == "finish"
    logs = [c for c in calls if c[0] == "log"]
    assert logs[0][1] == {"x": 2.0} and logs[0][2] == 1
    img_logs = [c for c in logs if "mapping_vis" in c[1]]
    assert len(img_logs) == 1
    assert img_logs[0][1]["mapping_vis"].path == str(img)
    pc = [c for c in logs if "input_pc" in c[1]][0][1]["input_pc"]
    assert pc.pts.shape == (4, 6)
    assert np.array_equal(pc.pts[:, :3], pos)
