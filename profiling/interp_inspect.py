"""Inspect interpolation internals: neighbor counts, weights, c variance."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
import jax
import jax.numpy as jnp

from point_slam_tpu.config import load_config
from point_slam_tpu.datasets import get_dataset
from point_slam_tpu.mapper import Mapper, sample_add_rays
from point_slam_tpu.models import decoders as D
from point_slam_tpu.ops import knn
from point_slam_tpu.common import sampling as S, camera
import point_slam_tpu.pointcloud as pc

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

cfg = load_config(os.path.join(HERE, "configs", "Synthetic", "room.yaml"),
                  os.path.join(HERE, "configs", "point_slam.yaml"))
cfg["synthetic"].update({"n_frames": 2, "angular_step": 0.01})
cfg["cam"].update({"H": 240, "W": 320, "fx": 200.0, "fy": 200.0,
                   "cx": 159.5, "cy": 119.5})
cfg["mapping"].update({"pixels": 2000, "pixels_adding": 4000})
cfg["rendering"]["sample_near_pcl"] = False
cfg["verbose"] = False

ds = get_dataset(cfg)
rng = np.random.default_rng(0)
params = D.init_decoders(jax.random.key(0), cfg)
mapper = Mapper(cfg, params, 10, rng)
_, color, depth, c2w = ds[0]
cd, dd, cw = jnp.asarray(color), jnp.asarray(depth), jnp.asarray(c2w)
r_add, r_query, _, _ = mapper.radius_maps(cd)
print("r_query map stats: min %.4f max %.4f mean %.4f" % (
    float(r_query.min()), float(r_query.max()), float(r_query.mean())))
print("cell_size:", mapper.cell_size, " table:", mapper.table_size,
      " C:", mapper.max_per_cell)

o, d, dep, col, ra, valid = sample_add_rays(
    mapper.ms, jax.random.key(1), cw, cd, dd, r_add, jnp.asarray(4000))
mapper.cloud, _ = pc.add_points(mapper.cloud, mapper.index, o, d, dep, col,
                                valid, ra, jax.random.key(2), 0.98, 1.02)
mapper.index = pc.build_index(mapper.cloud, mapper.cell_size,
                              mapper.table_size, mapper.max_per_cell)
print("pts:", int(mapper.cloud.n_points))

k = jax.random.key(5)
i, j = S.sample_pixels_uniform(k, 0, 240, 0, 320, 2000)
gt_d = S.gather_pixels(dd, i, j)
rq = S.gather_pixels(r_query, i, j)
ro, rd = camera.rays_from_uv(i, j, cw, 200.0, 200.0, 159.5, 119.5)
p = ro + rd * gt_d[:, None]

dists, idx, vmask = knn.grid_knn(mapper.index, p, k=8)
counts = knn.neighbor_count(dists, vmask, rq)
print("valid slots per query: mean %.2f" % float(vmask.sum(1).mean()))
print("in-radius counts: mean %.2f  frac>=2: %.3f  frac==0: %.3f" % (
    float(counts.mean()), float((counts >= 2).mean()),
    float((counts == 0).mean())))
print("sqrt(d2) stats: min %.4f med %.4f max %.4f" % (
    float(jnp.sqrt(dists[vmask]).min()),
    float(jnp.median(jnp.sqrt(jnp.where(vmask, dists, jnp.nan)))),
    float(jnp.sqrt(jnp.where(vmask, dists, 0)).max())))
print("rq (query radius) med %.4f" % float(jnp.median(rq)))

w = D.interpolation_weights(dists, vmask, rq, "distance")
print("weight max per query: mean %.3f (1.0 => nearest dominates)" %
      float(w.max(1).mean()))
print("weight row sums: frac zero rows %.3f" % float((w.sum(1) == 0).mean()))

nb = mapper.cloud.packed[idx]
c_col = jnp.sum(w[..., None] * nb[..., pc.COL_SL], axis=1)
print("c_col std across queries: %.4f (per-dim mean of std)" %
      float(jnp.std(c_col, axis=0).mean()))
print("col_feats std across points: %.4f" %
      float(jnp.std(np.asarray(mapper.cloud.packed[:int(mapper.cloud.n_points), pc.COL_SL]), axis=0).mean()))

# distinctness of neighbor sets
idx_np = np.asarray(idx)
uniq_frac = np.mean([len(np.unique(r)) for r in idx_np[:200]]) / 8
print("unique neighbors per query (first 200): %.2f/8" % (uniq_frac * 8))
