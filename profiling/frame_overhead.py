"""Per-frame fixed costs: radius maps, densify, index build, frustum."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from point_slam_tpu.config import load_config
from point_slam_tpu.datasets import get_dataset
from point_slam_tpu.mapper import Mapper, prepare_frame
from point_slam_tpu.models import decoders as D
from point_slam_tpu.common import image

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

cfg = load_config(os.path.join(HERE, "configs", "Synthetic", "room.yaml"),
                  os.path.join(HERE, "configs", "point_slam.yaml"))
cfg["synthetic"].update({"n_frames": 2, "angular_step": 0.01})
cfg["cam"].update({"H": 680, "W": 1200, "fx": 600.0, "fy": 600.0,
                   "cx": 599.5, "cy": 339.5})
cfg["mapping"].update({"pixels": 5000, "pixels_adding": 6000,
                       "pixels_based_on_color_grad": 1000, "iters": 300})
cfg["verbose"] = False
ds = get_dataset(cfg)
rng = np.random.default_rng(0)
mapper = Mapper(cfg, D.init_decoders(jax.random.key(0), cfg), 100, rng)
_, color, depth, c2w = ds[0]
cd = jnp.asarray(np.asarray(color))
jax.block_until_ready(cd)

N = 20


def bench(name, fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.time()
    for _ in range(N):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    print(f"{name}: {(time.time()-t0)/N*1e3:7.1f} ms", flush=True)


pcfg = cfg["pointcloud"]
bench("prepare_frame (radius+cand)", prepare_frame, cd,
      pcfg["radius_add_max"], pcfg["radius_add_min"],
      pcfg["radius_query_ratio"], pcfg["color_grad_threshold"],
      mapper.ms.grad_top)

f = jax.jit(lambda c: image.dynamic_radius_maps(
    c, pcfg["radius_add_max"], pcfg["radius_add_min"],
    pcfg["radius_query_ratio"], pcfg["color_grad_threshold"]))
bench("radius maps only           ", f, cd)

g = jax.jit(lambda c: image.color_gradient_magnitude(c))
bench("gradient magnitude only    ", g, cd)

h = jax.jit(lambda c: jax.lax.top_k(
    image.color_gradient_magnitude(c).reshape(-1), mapper.ms.grad_top))
bench("grad + top_k 816k->5000    ", h, cd)
