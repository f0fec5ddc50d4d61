"""Diagnose the seed-dependent color blow-up: param/feat norms, pre-sigmoid."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from point_slam_tpu.config import load_config
from point_slam_tpu.datasets import get_dataset
from point_slam_tpu.mapper import Mapper
from point_slam_tpu.models import decoders as D
from point_slam_tpu import renderer as R
from point_slam_tpu.common import sampling as S, camera
import point_slam_tpu.pointcloud as pc

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

cfg = load_config(os.path.join(HERE, "configs", "Synthetic", "room.yaml"),
                  os.path.join(HERE, "configs", "point_slam.yaml"))
cfg["synthetic"].update({"n_frames": 2, "angular_step": 0.01})
cfg["cam"].update({"H": 680, "W": 1200, "fx": 600.0, "fy": 600.0,
                   "cx": 599.5, "cy": 339.5})
cfg["mapping"].update({
    "pixels": 5000, "pixels_adding": 6000,
    "pixels_based_on_color_grad": 1000, "iters": 300, "iters_first": 500,
    "geo_iter_first": 200, "mapping_window_size": 12, "keyframe_every": 5,
})
cfg["rendering"]["sample_near_pcl"] = False
cfg["tpu"].update({"point_capacity_init": 1 << 19})
cfg["verbose"] = True
cfg["tpu"]["max_iters_per_launch"] = 25
for a in sys.argv:
    if a.startswith("--seed="):
        cfg["setup_seed"] = int(a.split("=")[1])

ds = get_dataset(cfg)
rng = np.random.default_rng(0)
params0 = D.init_decoders(jax.random.key(0), cfg)
norm0 = {k: float(sum(jnp.sum(l**2) for l in jax.tree_util.tree_leaves(v)))
         for k, v in params0["col"].items()}
mapper = Mapper(cfg, params0, 10, rng)
_, color, depth, c2w = ds[0]
st = mapper.map_frame(0, np.asarray(color), np.asarray(depth),
                      np.asarray(c2w), np.asarray(c2w))
print(f"mapped: col {st['color_loss']:.1f} pts {st['n_points']}", flush=True)

for k, v in mapper.params["col"].items():
    n = float(sum(jnp.sum(l**2) for l in jax.tree_util.tree_leaves(v)))
    print(f"col.{k}: |w|^2 {norm0[k]:10.2f} -> {n:10.2f}")

feats = mapper.cloud.packed[:int(mapper.cloud.n_points)]
print("col feats: std %.3f  max|.| %.2f" % (
    float(jnp.std(feats[:, pc.COL_SL])), float(jnp.abs(feats[:, pc.COL_SL]).max())))
print("geo feats: std %.3f  max|.| %.2f" % (
    float(jnp.std(feats[:, pc.GEO_SL])), float(jnp.abs(feats[:, pc.GEO_SL]).max())))

# pre-sigmoid render stats on a batch
cd, dd, cw = jnp.asarray(color), jnp.asarray(depth), jnp.asarray(c2w)
_, r_query, _, _ = mapper.radius_maps(cd)
i, j = S.sample_pixels_uniform(jax.random.key(3), 0, 680, 0, 1200, 2000)
gt_d = S.gather_pixels(dd, i, j)
rq = S.gather_pixels(r_query, i, j)
ro, rd = camera.rays_from_uv(i, j, cw, 600.0, 600.0, 599.5, 339.5)
dep_r, unc, col_r, vr = R.render_rays(
    mapper.params, mapper.cloud.packed, mapper.cloud.n_points, mapper.index,
    ro, rd, gt_d, rq, gt_d > 0, jax.random.key(4), mapper.rc,
    stage_color=True, apply_sigmoid_color=False)
print("pre-sigmoid: min %.2f max %.2f mean %.2f std %.2f" % (
    float(col_r.min()), float(col_r.max()), float(col_r.mean()),
    float(jnp.std(col_r))))
print("nan in feats:", bool(jnp.isnan(feats).any()),
      " nan in col params:", any(bool(jnp.isnan(l).any())
                                 for l in jax.tree_util.tree_leaves(mapper.params["col"])))
