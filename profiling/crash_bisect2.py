"""Stage 2: reproduce the worker crash through the full map_frame path."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from point_slam_tpu.config import load_config
from point_slam_tpu.datasets import get_dataset
from point_slam_tpu.mapper import Mapper
from point_slam_tpu.models import decoders as D

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

iters_first = int(sys.argv[1]) if len(sys.argv) > 1 else 300

cfg = load_config(os.path.join(HERE, "configs", "Synthetic", "room.yaml"),
                  os.path.join(HERE, "configs", "point_slam.yaml"))
cfg["synthetic"].update({"n_frames": 4, "angular_step": 0.01})
cfg["cam"].update({"H": 680, "W": 1200, "fx": 600.0, "fy": 600.0,
                   "cx": 599.5, "cy": 339.5})
cfg["mapping"].update({
    "pixels": 5000, "pixels_adding": 6000,
    "pixels_based_on_color_grad": 1000, "iters": 300,
    "iters_first": iters_first,
    "geo_iter_first": min(400, iters_first // 2), "mapping_window_size": 12,
    "keyframe_every": 5,
})
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
v = float(np.asarray(mapper.cloud.geo_feats).ravel()[0])
print(f"map_frame(0) iters_first={iters_first}: {time.time()-t0:.1f}s "
      f"n_points={st['n_points']} geo_loss={st['geo_loss']:.3f} v={v:.5f}",
      flush=True)
