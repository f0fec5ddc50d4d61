"""Capture an xprof trace of ~30 steady-state mapping iterations and dump
the top HLO ops by self time. Works through the axon tunnel if device
tracing is supported there; otherwise the xplane will only carry host data
(the script says which)."""
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from point_slam_tpu.config import load_config
from point_slam_tpu.datasets import get_dataset
from point_slam_tpu.mapper import Mapper
from point_slam_tpu.models import decoders as D
import point_slam_tpu.pointcloud as pc

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

cfg = load_config(os.path.join(HERE, "configs", "Synthetic", "room.yaml"),
                  os.path.join(HERE, "configs", "point_slam.yaml"))
cfg["synthetic"].update({"n_frames": 4, "angular_step": 0.01})
cfg["cam"].update({"H": 680, "W": 1200, "fx": 600.0, "fy": 600.0,
                   "cx": 599.5, "cy": 339.5})
cfg["mapping"].update({
    "pixels": 5000, "pixels_adding": 6000,
    "pixels_based_on_color_grad": 1000, "iters": 30, "iters_first": 30,
    "geo_iter_first": 10, "mapping_window_size": 12, "keyframe_every": 5,
})
cfg["rendering"]["sample_near_pcl"] = False
cfg["tpu"].update({"point_capacity_init": 1 << 19})
cfg["verbose"] = False

ds = get_dataset(cfg)
rng = np.random.default_rng(0)
mapper = Mapper(cfg, D.init_decoders(jax.random.key(0), cfg), 100, rng)
_, color, depth, c2w = ds[0]
color = np.asarray(color); depth = np.asarray(depth); c2w = np.asarray(c2w)

mapper.map_frame(0, color, depth, c2w, c2w)
np.asarray(mapper.cloud.packed[0, 0])

# steady-state cloud
CAP = mapper.cloud.pos.shape[0]
NPTS = 300_000
u = rng.uniform(-2.5, 2.5, (NPTS, 2)).astype(np.float32)
pts = np.stack([u[:, 0], u[:, 1],
                -2.0 + 0.3 * np.sin(u[:, 0] * 3)], -1).astype(np.float32)
pos = np.full((CAP, 3), 1e6, np.float32)
pos[:NPTS] = pts
feats = 0.1 * rng.standard_normal((CAP, 72)).astype(np.float32)
feats[:, pc.POS_SL] = pos
mapper.cloud = mapper.cloud._replace(
    packed=jnp.asarray(feats), n_points=jnp.asarray(NPTS, jnp.int32))
mapper.n_points_host = NPTS
mapper.index = pc.build_index(mapper.cloud, mapper.cell_size,
                              mapper.table_size, mapper.max_per_cell)

# warm the jit for this shape set
mapper.map_frame(1, color, depth, c2w, c2w)
np.asarray(mapper.cloud.packed[0, 0])

out_dir = "/tmp/xprof_map"
os.system(f"rm -rf {out_dir}")
jax.profiler.start_trace(out_dir)
t0 = time.time()
mapper.map_frame(1, color, depth, c2w, c2w)
np.asarray(mapper.cloud.packed[0, 0])
wall = time.time() - t0
jax.profiler.stop_trace()
print(f"traced map_frame (30 iters): {wall:.2f}s")

planes = glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                   recursive=True)
print("xplane files:", planes)
if planes:
    from xprof.convert import raw_to_tool_data as rtd
    for tool in ("framework_op_stats", "hlo_stats"):
        try:
            data, _ = rtd.xspace_to_tool_data(planes, tool, {})
            out = os.path.join(out_dir, tool + ".out")
            mode = "wb" if isinstance(data, bytes) else "w"
            with open(out, mode) as f:
                f.write(data)
            print(f"wrote {out} ({len(data)} bytes)")
        except Exception as e:
            print(f"{tool}: FAILED {type(e).__name__}: {e}")
