"""Frame-0-only color convergence probe with per-chunk loss logging."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from point_slam_tpu.config import load_config
from point_slam_tpu.datasets import get_dataset
from point_slam_tpu.mapper import Mapper, map_optimize
from point_slam_tpu.models import decoders as D
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
    "geo_iter_first": 100, "mapping_window_size": 12, "keyframe_every": 5,
})
cfg["rendering"]["sample_near_pcl"] = False
cfg["tpu"].update({"point_capacity_init": 1 << 19})
cfg["verbose"] = False
cfg["mapping"]["fix_geo_decoder"] = "--train_geo" not in sys.argv

ds = get_dataset(cfg)
rng = np.random.default_rng(0)
params = D.init_decoders(jax.random.key(0), cfg)
mapper = Mapper(cfg, params, 100, rng)
_, color, depth, c2w = ds[0]
color = np.asarray(color); depth = np.asarray(depth); c2w = np.asarray(c2w)

cd, dd, cw = jnp.asarray(color), jnp.asarray(depth), jnp.asarray(c2w)
r_add, r_query, _, _ = mapper.radius_maps(cd)

# densify once
from point_slam_tpu.mapper import sample_add_rays
o, d, dep, col, ra, valid = sample_add_rays(
    mapper.ms, jax.random.key(1), cw, cd, dd, r_add, jnp.asarray(18000))
mapper.cloud, n1 = pc.add_points(
    mapper.cloud, mapper.index, o, d, dep, col, valid, ra,
    jax.random.key(2), 0.98, 1.02, n_add=3)
mapper.index = pc.build_index(mapper.cloud, mapper.cell_size,
                              mapper.table_size, mapper.max_per_cell)
print(f"cloud: {int(mapper.cloud.n_points)} pts", flush=True)

f = mapper.ms.f_max
slots = jnp.zeros((f,), jnp.int32)
w_color = mapper.ring.color[slots].at[0].set(cd)
w_depth = mapper.ring.depth[slots].at[0].set(dd)
w_rq = mapper.ring.r_query[slots].at[0].set(r_query)
w_c2w = mapper.ring.est_c2w[slots].at[0].set(cw)
w_exp = mapper.ring.exposure[slots]
frustum = jnp.arange(mapper.cloud.packed.shape[0]) < mapper.cloud.n_points

sched = cfg["mapping"]["init"]
lr_geo = jnp.asarray([sched["geometry"]["decoders_lr"],
                      sched["geometry"]["geometry_lr"],
                      sched["geometry"]["color_lr"]], jnp.float32)
lr_col = jnp.asarray([sched["color"]["decoders_lr"],
                      sched["color"]["geometry_lr"],
                      sched["color"]["color_lr"]], jnp.float32)
geo_bound = 100
total = 1000
chunk = 100
packed = mapper.cloud.packed
paramsd = mapper.params
opt = None
key = jax.random.key(3)
it = 0
while it < total:
    n_end = min(it + chunk, total)
    (paramsd, packed, w_exp2, stats, opt, key) = map_optimize(
        mapper.ms, mapper.rc, paramsd, packed, mapper.cloud.n_points,
        mapper.index, w_color, w_depth, w_rq, w_c2w, w_exp,
        jnp.asarray(1), jnp.asarray(5000), jnp.asarray(0), frustum,
        lr_geo, lr_col, jnp.asarray(0.001), jnp.asarray(1.0),
        jnp.asarray(geo_bound), jnp.asarray(n_end), key,
        it0=jnp.asarray(it, jnp.int32), opt_in=opt)
    s = np.asarray(stats)
    print(f"it {n_end:4d}: geo {s[0]:9.3f} col {s[1]:9.3f} n_mask {s[2]:.0f}",
          flush=True)
    it = n_end
