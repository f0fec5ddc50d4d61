"""Debug tracking drift at bench scale: per-frame losses + pose errors."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from point_slam_tpu.config import load_config
from point_slam_tpu.slam import PointSLAM

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_FRAMES = 8 if '--few_frames' not in __import__('sys').argv else 1

cfg = load_config(os.path.join(HERE, "configs", "Synthetic", "room.yaml"),
                  os.path.join(HERE, "configs", "point_slam.yaml"))
cfg["synthetic"].update({"n_frames": N_FRAMES, "angular_step": 0.01})
cfg["cam"].update({"H": 680, "W": 1200, "fx": 600.0, "fy": 600.0,
                   "cx": 599.5, "cy": 339.5})
cfg["tracking"].update({"pixels": 1500, "iters": 40,
                        "ignore_edge_W": 100, "ignore_edge_H": 100})
cfg["mapping"].update({
    "pixels": 5000, "pixels_adding": 6000,
    "pixels_based_on_color_grad": 1000, "iters": 300, "iters_first": 500,
    "geo_iter_first": 200, "mapping_window_size": 12, "keyframe_every": 5,
    "every_frame": 5, "lazy_start": False, "color_refine": False,
})
cfg["rendering"]["sample_near_pcl"] = False
cfg["tpu"].update({"point_capacity_init": 1 << 19})
cfg["verbose"] = "--chunks" in sys.argv
cfg["data"]["output"] = "/tmp/track_quality"
import sys as _sys
if "--train_geo" in _sys.argv:
    cfg["mapping"]["fix_geo_decoder"] = False
if "--no_frustum" in _sys.argv:
    cfg["mapping"]["frustum_feature_selection"] = False
if "--no_grad_add" in _sys.argv:
    cfg["mapping"]["pixels_based_on_color_grad"] = 0
if "--few_frames" in _sys.argv:
    N_FRAMES = 1
for a in _sys.argv:
    if a.startswith("--seed="):
        cfg["setup_seed"] = int(a.split("=")[1])

slam = PointSLAM(cfg)
ds = slam.dataset

color, depth, gt = slam._frame(0)
slam.estimate_c2w_list[0] = gt
slam.gt_c2w_list[0] = gt
st = slam.mapper.map_frame(0, color, depth, gt, gt)
print(f"frame0 mapped: {st['n_points']} pts, geo {st['geo_loss']:.2f} "
      f"col {st['color_loss']:.2f} n_iters {st['n_iters']}", flush=True)

for idx in range(1, N_FRAMES):
    color, depth, gt = slam._frame(idx)
    slam.gt_c2w_list[idx] = gt
    r_add, r_query, _, _ = slam.mapper.radius_maps(jnp.asarray(color))
    res = slam.tracker.track_frame(idx, color, depth, gt,
                                   slam.estimate_c2w_list, slam.mapper,
                                   r_query)
    slam.estimate_c2w_list[idx] = res["c2w"]
    terr = np.linalg.norm(res["c2w"][:3, 3] - gt[:3, 3]) * 100
    # also error of the INITIAL pose guess (motion model)
    init = slam.tracker.initial_pose(idx, slam.estimate_c2w_list, gt) \
        if idx > 1 else None
    msg = f"frame {idx}: terr {terr:6.2f} cm"
    if res.get("tracked"):
        msg += (f"  loss {res['first_loss']:9.2f} -> {res['best_loss']:9.2f}")
    print(msg, flush=True)
    if idx % 5 == 0 or idx == N_FRAMES - 1:
        st = slam.mapper.map_frame(idx, color, depth, gt,
                                   slam.estimate_c2w_list[idx])
        print(f"  [map] geo {st['geo_loss']:.2f} col {st['color_loss']:.2f} "
              f"iters {st['n_iters']} pts {st['n_points']}", flush=True)
