"""Bisect the TPU worker crash in frame-0 mapping at Replica scale."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from point_slam_tpu.config import load_config
from point_slam_tpu.datasets import get_dataset
from point_slam_tpu.mapper import Mapper, map_optimize, sample_add_rays
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
    "pixels_based_on_color_grad": 1000, "iters": 300, "iters_first": 1500,
    "geo_iter_first": 400, "mapping_window_size": 12, "keyframe_every": 5,
})
cfg["rendering"]["sample_near_pcl"] = False
cfg["tpu"].update({"point_capacity_init": 1 << 19})
cfg["verbose"] = False

stage = sys.argv[1] if len(sys.argv) > 1 else "all"

ds = get_dataset(cfg)
rng = np.random.default_rng(0)
params = D.init_decoders(jax.random.key(0), cfg)
mapper = Mapper(cfg, params, 100, rng)
_, color, depth, c2w = ds[0]
color = np.asarray(color); depth = np.asarray(depth); c2w = np.asarray(c2w)


def done(name, x):
    v = float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])
    print(f"OK {name} [v={v:.6f}]", flush=True)


color_dev = jnp.asarray(color)
depth_dev = jnp.asarray(depth)
c2w_dev = jnp.asarray(c2w)

t0 = time.time()
maps = mapper.radius_maps(color_dev)
done(f"radius_maps ({time.time()-t0:.1f}s)", maps[0])
r_add, r_query, cand_idx, cand_ok = maps

t0 = time.time()
o, d, dep, col, ra, valid = sample_add_rays(
    mapper.ms, jax.random.key(1), c2w_dev, color_dev, depth_dev, r_add,
    jnp.asarray(6000))
done(f"sample_add_rays ({time.time()-t0:.1f}s)", o)

t0 = time.time()
cloud2, n1 = pc.add_points(
    mapper.cloud, mapper.index, o, d, dep, col, valid, ra,
    jax.random.key(2), 0.98, 1.02, n_add=3, fix_interval=False)
done(f"add_points ({time.time()-t0:.1f}s, n={int(n1)})", cloud2.pos)

t0 = time.time()
index2 = pc.build_index(cloud2, mapper.cell_size, mapper.table_size,
                        mapper.max_per_cell)
done(f"build_index ({time.time()-t0:.1f}s)", index2.table)

mapper.cloud = cloud2
mapper.index = index2
frustum = jnp.arange(cloud2.pos.shape[0]) < cloud2.n_points

if stage in ("all", "optimize"):
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    f = mapper.ms.f_max
    slots = jnp.zeros((f,), jnp.int32)
    w_color = mapper.ring.color[slots].at[0].set(color_dev)
    w_depth = mapper.ring.depth[slots].at[0].set(depth_dev)
    w_rq = mapper.ring.r_query[slots].at[0].set(r_query)
    w_c2w = mapper.ring.est_c2w[slots].at[0].set(c2w_dev)
    w_exp = mapper.ring.exposure[slots]
    lr = jnp.asarray([0.001, 0.03, 0.0], jnp.float32)
    lrc = jnp.asarray([0.005, 0.005, 0.005], jnp.float32)
    t0 = time.time()
    import itertools
    for n2, gb in itertools.product((10, n_iters + 10), (0, 10**6)):
        t0 = time.time()
        out = map_optimize(
            mapper.ms, mapper.rc, mapper.params, cloud2.packed,
            cloud2.n_points, index2,
            w_color, w_depth, w_rq, w_c2w, w_exp,
            jnp.asarray(1), jnp.asarray(5000), jnp.asarray(0), frustum,
            lr, lrc, jnp.asarray(0.001), jnp.asarray(1.0),
            jnp.asarray(gb), jnp.asarray(n2), jax.random.key(n2))
        s_ = float(np.asarray(out[3]).sum())
        print(f"n_iters={n2} geo_bound={gb}: {time.time()-t0:.2f}s "
              f"(stats={s_:.3f})", flush=True)
    # repeat steady
    for n2, gb in itertools.product((10, n_iters + 10), (0, 10**6)):
        t0 = time.time()
        out = map_optimize(
            mapper.ms, mapper.rc, mapper.params, cloud2.packed,
            cloud2.n_points, index2,
            w_color, w_depth, w_rq, w_c2w, w_exp,
            jnp.asarray(1), jnp.asarray(5000), jnp.asarray(0), frustum,
            lr, lrc, jnp.asarray(0.001), jnp.asarray(1.0),
            jnp.asarray(gb), jnp.asarray(n2), jax.random.key(n2))
        s_ = float(np.asarray(out[3]).sum())
        print(f"steady n_iters={n2} geo_bound={gb}: {time.time()-t0:.2f}s",
              flush=True)
