"""Per-iteration mapping cost via the real map_frame path (two iter counts)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from point_slam_tpu.config import load_config
from point_slam_tpu.datasets import get_dataset
from point_slam_tpu.mapper import Mapper
from point_slam_tpu.models import decoders as D

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(iters_first):
    cfg = load_config(os.path.join(HERE, "configs", "Synthetic", "room.yaml"),
                      os.path.join(HERE, "configs", "point_slam.yaml"))
    cfg["synthetic"].update({"n_frames": 4, "angular_step": 0.01})
    cfg["cam"].update({"H": 680, "W": 1200, "fx": 600.0, "fy": 600.0,
                       "cx": 599.5, "cy": 339.5})
    cfg["mapping"].update({
        "pixels": 5000, "pixels_adding": 6000,
        "pixels_based_on_color_grad": 1000, "iters": 400,
        "iters_first": iters_first,
        "geo_iter_first": iters_first // 2, "mapping_window_size": 12,
        "keyframe_every": 5,
    })
    cfg["rendering"]["sample_near_pcl"] = False
    cfg["tpu"].update({"point_capacity_init": 1 << 19})
    cfg["verbose"] = False
    ds = get_dataset(cfg)
    rng = np.random.default_rng(0)
    params = D.init_decoders(jax.random.key(0), cfg)
    mapper = Mapper(cfg, params, 100, rng)
    return cfg, ds, mapper


cfg, ds, _ = build(60)
_, color, depth, c2w = ds[0]
color = np.asarray(color); depth = np.asarray(depth); c2w = np.asarray(c2w)

times = {}
for it in (60, 60, 360):
    _, _, mapper = build(it)
    t0 = time.time()
    st = mapper.map_frame(0, color, depth, c2w, c2w)
    float(np.asarray(mapper.cloud.packed).ravel()[0])
    dt = time.time() - t0
    times[it] = dt
    print(f"map_frame iters_first={it}: {dt:.1f}s "
          f"(n_points={st['n_points']})", flush=True)

per = (times[360] - times[60]) / 300
print(f"mapping per-iteration: {per*1e3:.1f} ms")
