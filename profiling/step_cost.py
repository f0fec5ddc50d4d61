"""End-to-end steady-state cost of the mapping/tracking steps at Replica scale.

Drives the HIGH-LEVEL Mapper.map_frame / Tracker.track_frame paths (so it
measures exactly what the production loop runs, including chunked launches
and host work). Per-iteration cost is isolated by differencing two
iteration budgets. Sync via host readback (axon's block_until_ready does
not wait).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from point_slam_tpu.config import load_config
from point_slam_tpu.datasets import get_dataset
from point_slam_tpu.mapper import Mapper
from point_slam_tpu.tracker import Tracker
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
    "pixels_based_on_color_grad": 1000, "iters": 300, "iters_first": 150,
    "geo_iter_first": 50, "mapping_window_size": 12, "keyframe_every": 5,
})
cfg["tracking"].update({"pixels": 1500, "iters": 40})
cfg["rendering"]["sample_near_pcl"] = False
cfg["tpu"].update({"point_capacity_init": 1 << 19})
cfg["verbose"] = False

ds = get_dataset(cfg)
rng = np.random.default_rng(0)
params = D.init_decoders(jax.random.key(0), cfg)
mapper = Mapper(cfg, params, 100, rng)

_, color, depth, c2w = ds[0]
color = np.asarray(color); depth = np.asarray(depth); c2w = np.asarray(c2w)

t0 = time.time()
st = mapper.map_frame(0, color, depth, c2w, c2w)
np.asarray(mapper.cloud.packed[0, 0])
print(f"frame0 map_frame wall (incl compile, "
      f"{cfg['mapping']['iters_first']} iters): {time.time()-t0:.1f}s  "
      f"n_points={st['n_points']}", flush=True)

# inflate the cloud to steady-state scale (~300k points) for realistic timing
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


def timed_map(idx, n_iters):
    cfg["mapping"]["iters"] = n_iters
    t0 = time.time()
    mapper.map_frame(idx, color, depth, c2w, c2w)
    np.asarray(mapper.cloud.packed[0, 0])
    return time.time() - t0


# warm both budgets (compile), then measure best-of-3
for n in (4, 54):
    timed_map(1, n)
ts = {}
for n in (4, 54):
    ts[n] = min(timed_map(1, n) for _ in range(3))
per_iter = (ts[54] - ts[4]) / 50
print(f"map_frame n_iters=4: {ts[4]:.2f}s  n_iters=54: {ts[54]:.2f}s")
print(f"mapping per-iteration: {per_iter*1e3:.1f} ms  "
      f"(per-frame fixed overhead ~{ts[4] - 4*per_iter:.2f}s)")
print(f"projected mapped frame at 300 iters: {ts[4] - 4*per_iter + 300*per_iter:.2f}s")

# tracker
cfg["mapping"]["iters"] = 300
tracker = Tracker(cfg, 100)
_, r_query, _, _ = mapper.radius_maps(jnp.asarray(color))
est = np.tile(np.eye(4, dtype=np.float32), (100, 1, 1))
est[0] = c2w; est[1] = c2w

t0 = time.time()
res = tracker.track_frame(2, color, depth, c2w, est, mapper, r_query)
print(f"track_frame first (compile, 40 it): {time.time()-t0:.1f}s")
best = 1e9
for _ in range(3):
    t0 = time.time()
    res = tracker.track_frame(2, color, depth, c2w, est, mapper, r_query)
    best = min(best, time.time() - t0)
print(f"track_frame steady (40 it x 1500 rays): {best:.2f}s "
      f"({best/40*1e3:.1f} ms/iter)")
