"""Tracker per-iteration cost via n_iters delta at bench scale."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from point_slam_tpu.config import load_config
from point_slam_tpu.datasets import get_dataset
from point_slam_tpu.mapper import Mapper
from point_slam_tpu.tracker import Tracker, track_optimize
from point_slam_tpu.models import decoders as D
from point_slam_tpu.common import camera, image

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

cfg = load_config(os.path.join(HERE, "configs", "Synthetic", "room.yaml"),
                  os.path.join(HERE, "configs", "point_slam.yaml"))
cfg["synthetic"].update({"n_frames": 4, "angular_step": 0.01})
cfg["cam"].update({"H": 680, "W": 1200, "fx": 600.0, "fy": 600.0,
                   "cx": 599.5, "cy": 339.5})
cfg["tracking"].update({"pixels": 1500, "iters": 40,
                        "ignore_edge_W": 100, "ignore_edge_H": 100})
cfg["mapping"].update({"pixels": 5000, "pixels_adding": 6000,
                       "pixels_based_on_color_grad": 1000,
                       "iters": 300, "iters_first": 300, "geo_iter_first": 150,
                       "mapping_window_size": 12})
cfg["rendering"]["sample_near_pcl"] = False
cfg["tpu"].update({"point_capacity_init": 1 << 19})
cfg["verbose"] = False

ds = get_dataset(cfg)
rng = np.random.default_rng(0)
params = D.init_decoders(jax.random.key(0), cfg)
mapper = Mapper(cfg, params, 100, rng)
tracker = Tracker(cfg, 100)
_, color, depth, c2w = ds[0]
mapper.map_frame(0, np.asarray(color), np.asarray(depth), np.asarray(c2w),
                 np.asarray(c2w))
print(f"mapped ({mapper.n_points_host} pts)", flush=True)

_, color, depth, c2w = ds[1]
cd, dd = jnp.asarray(color), jnp.asarray(depth)
_, r_query, _, _ = mapper.radius_maps(cd)
cam_init = jnp.asarray(camera.tensor_from_pose_matrix(np.asarray(c2w, np.float32)))
ts, rc = tracker.ts, tracker.rc


def run(n):
    out = track_optimize(
        ts, rc, mapper.params, mapper.cloud.packed, mapper.cloud.n_points,
        mapper.index, cd, dd, r_query, cam_init,
        jnp.zeros(1, jnp.int32), jnp.zeros(1, bool),
        jnp.asarray(0.002, jnp.float32), jnp.asarray(n), jax.random.key(2))
    return float(np.asarray(out[3]))


for n in (4, 4, 44, 44, 4, 44):
    t0 = time.time()
    v = run(n)
    print(f"track_optimize n={n}: {time.time()-t0:.2f}s (best {v:.2f})",
          flush=True)
