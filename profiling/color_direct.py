"""Fit the color model DIRECTLY at surface points (no compositing). (CPU)

If this fits fast, the color model is fine and the plateau comes from
compositing; if it also plateaus, the decoder/interpolation is the problem.
"""
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
from point_slam_tpu.ops import adam, knn
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
o, d, dep, col, ra, valid = sample_add_rays(
    mapper.ms, jax.random.key(1), cw, cd, dd, r_add, jnp.asarray(4000))
mapper.cloud, _ = pc.add_points(mapper.cloud, mapper.index, o, d, dep, col,
                                valid, ra, jax.random.key(2), 0.98, 1.02)
mapper.index = pc.build_index(mapper.cloud, mapper.cell_size,
                              mapper.table_size, mapper.max_per_cell)
print("pts:", int(mapper.cloud.n_points), flush=True)
rc = mapper.rc


def color_at(params_col, packed, p, rq):
    dists, idx, vmask = knn.grid_knn(mapper.index, p, k=8)
    w = D.interpolation_weights(dists, vmask, rq, "distance")
    nb = packed[idx]
    neigh_pos = jax.lax.stop_gradient(nb[..., pc.POS_SL])
    nf = D.encode_neighbor_feats(params_col, neigh_pos, p, nb[..., pc.COL_SL])
    c = jnp.sum(w[..., None] * nf, axis=1)
    return D.col_decoder_apply(params_col, p, c)


def loss_fn(diff, k):
    i, j = S.sample_pixels_uniform(k, 0, 240, 0, 320, 2000)
    gt_d = S.gather_pixels(dd, i, j)
    gt_c = S.gather_pixels(cd, i, j)
    rq = S.gather_pixels(r_query, i, j)
    ro, rd = camera.rays_from_uv(i, j, cw, 200.0, 200.0, 159.5, 119.5)
    p = ro + rd * gt_d[:, None]
    pred = color_at(diff["col"], diff["packed"], p, rq)
    ok = gt_d > 0
    return jnp.sum(jnp.where(ok[:, None], jnp.abs(gt_c - pred), 0.0))


@jax.jit
def step(diff, opt, k, t):
    l, g = jax.value_and_grad(loss_fn)(diff, k)
    lrrow = jnp.zeros((pc.PACK_W,)).at[pc.COL_SL].set(0.005)
    newp, st_p = adam.update(diff["packed"], g["packed"],
                             {"m": opt["m"]["packed"], "v": opt["v"]["packed"]},
                             t, lrrow)
    newc, st_c = adam.update(diff["col"], g["col"],
                             {"m": opt["m"]["col"], "v": opt["v"]["col"]},
                             t, jnp.asarray(0.005))
    return ({"packed": newp, "col": newc},
            {"m": {"packed": st_p["m"], "col": st_c["m"]},
             "v": {"packed": st_p["v"], "col": st_c["v"]}}, l)


diff = {"col": mapper.params["col"], "packed": mapper.cloud.packed}
opt = adam.init_state(diff)
k = jax.random.key(11)
for t in range(1, 201):
    k, kk = jax.random.split(k)
    diff, opt, l = step(diff, opt, kk, jnp.asarray(float(t)))
    if t % 25 == 0 or t == 1:
        print(f"it {t:3d}: direct col loss {float(l):8.1f}", flush=True)
