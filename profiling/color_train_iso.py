"""Isolated color training: does color loss decrease with plain Adam? (CPU)"""
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
from point_slam_tpu.ops import adam
from point_slam_tpu.common import sampling as S, camera
from point_slam_tpu import renderer as R
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
o, d, dep, col, ra, valid = sample_add_rays(
    mapper.ms, jax.random.key(1), cw, cd, dd, r_add, jnp.asarray(4000))
mapper.cloud, _ = pc.add_points(mapper.cloud, mapper.index, o, d, dep, col,
                                valid, ra, jax.random.key(2), 0.98, 1.02)
mapper.index = pc.build_index(mapper.cloud, mapper.cell_size,
                              mapper.table_size, mapper.max_per_cell)
print("pts:", int(mapper.cloud.n_points), flush=True)


def batch(k):
    i, j = S.sample_pixels_uniform(k, 0, 240, 0, 320, 2000)
    return (S.gather_pixels(dd, i, j), S.gather_pixels(cd, i, j),
            S.gather_pixels(r_query, i, j),
            *camera.rays_from_uv(i, j, cw, 200.0, 200.0, 159.5, 119.5))


def loss_fn(diff, k):
    gt_d, gt_c, rq, ro, rd = batch(k)
    ok = gt_d > 0
    depth_r, unc, col_r, valid_ray = R.render_rays(
        {"geo": mapper.params["geo"], "col": diff["col"]}, diff["packed"],
        mapper.cloud.n_points, mapper.index, ro, rd, gt_d, rq, ok,
        jax.random.fold_in(k, 1), mapper.rc, stage_color=True)
    mask = ok & valid_ray
    geo_l = jnp.sum(jnp.where(mask, jnp.abs(gt_d - depth_r), 0.0))
    closs = jnp.sum(jnp.where(mask[:, None], jnp.abs(gt_c - col_r), 0.0))
    return geo_l + 0.1 * closs, (geo_l, closs)


@jax.jit
def step(diff, opt, k, t):
    (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(diff, k)
    lrrow = (jnp.zeros((pc.PACK_W,)).at[pc.COL_SL].set(0.005)
             .at[pc.GEO_SL].set(0.005))
    newp, st_p = adam.update(diff["packed"], g["packed"],
                             {"m": opt["m"]["packed"], "v": opt["v"]["packed"]},
                             t, lrrow)
    newc, st_c = adam.update(diff["col"], g["col"],
                             {"m": opt["m"]["col"], "v": opt["v"]["col"]},
                             t, jnp.asarray(0.005))
    return ({"packed": newp, "col": newc},
            {"m": {"packed": st_p["m"], "col": st_c["m"]},
             "v": {"packed": st_p["v"], "col": st_c["v"]}}, aux)


diff = {"col": mapper.params["col"], "packed": mapper.cloud.packed}
opt = adam.init_state(diff)
k = jax.random.key(11)
for t in range(1, 201):
    k, kk = jax.random.split(k)
    diff, opt, aux = step(diff, opt, kk, jnp.asarray(float(t)))
    if t % 25 == 0 or t == 1:
        print(f"it {t:3d}: geo {float(aux[0]):8.2f} col {float(aux[1]):8.1f}",
              flush=True)
