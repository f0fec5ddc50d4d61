"""Ablate color-model components to find what blocks fitting. (CPU)"""
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
params0 = D.init_decoders(jax.random.key(0), cfg)
mapper = Mapper(cfg, params0, 10, rng)
_, color, depth, c2w = ds[0]
cd, dd, cw = jnp.asarray(color), jnp.asarray(depth), jnp.asarray(c2w)
r_add, r_query, _, _ = mapper.radius_maps(cd)
o, d, dep, col, ra, valid = sample_add_rays(
    mapper.ms, jax.random.key(1), cw, cd, dd, r_add, jnp.asarray(4000))
mapper.cloud, _ = pc.add_points(mapper.cloud, mapper.index, o, d, dep, col,
                                valid, ra, jax.random.key(2), 0.98, 1.02)
mapper.index = pc.build_index(mapper.cloud, mapper.cell_size,
                              mapper.table_size, mapper.max_per_cell)


def run(name, emb_scale=None, use_rel=True, zero_emb=False, n=150,
        lr=0.005):
    params = D.init_decoders(jax.random.key(0), cfg)
    colp = params["col"]
    if emb_scale is not None:
        colp = dict(colp)
        colp["embedder_B"] = (emb_scale / 32.0) * colp["embedder_B"]
    if zero_emb:
        colp = dict(colp)
        colp["embedder_B"] = 0.0 * colp["embedder_B"]

    def color_at(pcol, packed, p, rq):
        dists, idx, vmask = knn.grid_knn(mapper.index, p, k=8)
        w = D.interpolation_weights(dists, vmask, rq, "distance")
        nb = packed[idx]
        if use_rel:
            nf = D.encode_neighbor_feats(
                pcol, jax.lax.stop_gradient(nb[..., pc.POS_SL]), p,
                nb[..., pc.COL_SL])
        else:
            nf = nb[..., pc.COL_SL]
        c = jnp.sum(w[..., None] * nf, axis=1)
        return D.col_decoder_apply(pcol, p, c)

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
        lrrow = jnp.zeros((pc.PACK_W,)).at[pc.COL_SL].set(lr)
        newp, st_p = adam.update(diff["packed"], g["packed"],
                                 {"m": opt["m"]["packed"],
                                  "v": opt["v"]["packed"]}, t, lrrow)
        newc, st_c = adam.update(diff["col"], g["col"],
                                 {"m": opt["m"]["col"], "v": opt["v"]["col"]},
                                 t, jnp.asarray(lr))
        return ({"packed": newp, "col": newc},
                {"m": {"packed": st_p["m"], "col": st_c["m"]},
                 "v": {"packed": st_p["v"], "col": st_c["v"]}}, l)

    diff = {"col": colp, "packed": mapper.cloud.packed}
    opt = adam.init_state(diff)
    k = jax.random.key(11)
    first = last = None
    for t in range(1, n + 1):
        k, kk = jax.random.split(k)
        diff, opt, l = step(diff, opt, kk, jnp.asarray(float(t)))
        if t == 1:
            first = float(l)
        last = float(l)
    print(f"{name}: {first:8.1f} -> {last:8.1f}", flush=True)


run("baseline (scale 32, rel)  ")
run("no positional emb         ", zero_emb=True)
run("no rel-pos encoder        ", use_rel=False)
run("emb scale 3               ", emb_scale=3.0)
run("emb scale 3 + no rel      ", emb_scale=3.0, use_rel=False)
run("lr 0.02                   ", lr=0.02)
