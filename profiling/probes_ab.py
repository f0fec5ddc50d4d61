"""knn_probes x mlp_precision grid, full mapping step, END-TO-END ms/iter.

VERDICT r3 task 1 levers (a)+(c) measured together so the bench candidate
config is chosen from one table: probes {36, 27} x mlp {'highest',
'default'}. Same harness as mlp_precision_ab.py / knn_packed_ab.py
(chained fori_loop, identical inputs). Quality is gated separately by
profiling/quality_gate.py A/B probes.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_default_matmul_precision", "highest")  # as run.py

from point_slam_tpu.config import load_config
from point_slam_tpu.datasets import get_dataset
from point_slam_tpu.mapper import Mapper, _sample_window_rays, _losses
from point_slam_tpu.models import decoders as D
from point_slam_tpu.ops import adam
import point_slam_tpu.pointcloud as pc

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

cfg = load_config(os.path.join(HERE, "configs", "Synthetic", "room.yaml"),
                  os.path.join(HERE, "configs", "point_slam.yaml"))
cfg["synthetic"].update({"n_frames": 4, "angular_step": 0.01})
cfg["cam"].update({"H": 680, "W": 1200, "fx": 600.0, "fy": 600.0,
                   "cx": 599.5, "cy": 339.5})
cfg["mapping"].update({
    "pixels": 5000, "pixels_adding": 6000,
    "pixels_based_on_color_grad": 1000, "iters": 300, "iters_first": 60,
    "geo_iter_first": 30, "mapping_window_size": 12, "keyframe_every": 5,
})
cfg["rendering"]["sample_near_pcl"] = False
cfg["tpu"].update({"point_capacity_init": 1 << 19})
cfg["verbose"] = False

ds = get_dataset(cfg)
rng = np.random.default_rng(0)
params = D.init_decoders(jax.random.key(0), cfg)
mapper = Mapper(cfg, params, 100, rng)
_, color, depth, c2w = ds[0]

CAP = mapper.cloud.pos.shape[0]
NPTS = 300_000
u = rng.uniform(-2.5, 2.5, (NPTS, 2)).astype(np.float32)
pts = np.stack([u[:, 0], u[:, 1],
                -2.0 + 0.3 * np.sin(u[:, 0] * 3)], -1).astype(np.float32)
pos = np.full((CAP, 3), 1e6, np.float32)
pos[:NPTS] = pts
mapper.cloud = mapper.cloud._replace(
    packed=mapper.cloud.packed.at[:, pc.POS_SL].set(jnp.asarray(pos)),
    n_points=jnp.asarray(NPTS, jnp.int32))
index = pc.build_index(mapper.cloud, mapper.cell_size,
                       mapper.table_size, mapper.max_per_cell,
                       mapper.packed_coords)

ms = mapper.ms
f = ms.f_max
cd, dd = jnp.asarray(color), jnp.asarray(depth)
r_add, r_query, _, _ = mapper.radius_maps(cd)
window = dict(color=jnp.zeros((f,) + cd.shape, jnp.float32).at[0].set(cd),
              depth=jnp.zeros((f,) + dd.shape, jnp.float32).at[0].set(dd),
              r_query=jnp.full((f,) + dd.shape, 1e6, jnp.float32)
              .at[0].set(r_query))
w_c2w = jnp.tile(jnp.eye(4, dtype=jnp.float32), (f, 1, 1)) \
    .at[0].set(jnp.asarray(c2w))
w_exp = jnp.zeros((f, cfg["model"]["exposure_dim"]), jnp.float32)
frustum = (jnp.arange(CAP) < mapper.cloud.n_points)
cloud = mapper.cloud
n_frames = jnp.asarray(1)
ppi = jnp.asarray(5000)

N = 30
diff0 = {"col": mapper.params["col"], "packed": cloud.packed}
opt0 = adam.init_state(diff0)
BIG = dict(window=window, w_c2w=w_c2w, w_exp=w_exp, cloud=cloud,
           index=index, params=mapper.params,
           frustum=frustum, diff0=diff0, opt0=opt0)


def chain(name, step):
    @jax.jit
    def run(key, big):
        def body(i, k):
            return step(k, big)
        return jax.lax.fori_loop(0, N, body, key)
    k0 = jax.random.key(0)
    t0 = time.time()
    float(jax.random.key_data(run(k0, BIG))[0])
    ct = time.time() - t0
    t0 = time.time()
    float(jax.random.key_data(run(k0, BIG))[0])
    dt = (time.time() - t0) / N
    print(f"{name}: {dt*1e3:7.2f} ms/iter (compile {ct:.0f}s)", flush=True)
    return dt


def mix(k, x):
    return jax.random.fold_in(k, (jnp.sum(x) * 0.0).astype(jnp.int32) + 1)


def s_full(rc):
    def loss_fn(diff, b, rays, kk):
        p = {"col": diff["col"], "geo": b["params"]["geo"]}
        return _losses(ms, rc, p, diff["packed"],
                       b["w_exp"], b["cloud"].n_points,
                       b["index"], rays, b["w_c2w"], kk,
                       stage_color=True)
    grad_col = jax.grad(lambda d, b, r, kk: loss_fn(d, b, r, kk)[0])

    def step(k, b):
        rays = _sample_window_rays(ms, k, b["window"], n_frames, ppi)
        g = grad_col(b["diff0"], b, rays, k)
        g["packed"] = g["packed"] * b["frustum"][:, None]
        acc = 0.0
        for name in ("col", "packed"):
            p, st = adam.update(b["diff0"][name], g[name],
                                {"m": b["opt0"]["m"][name],
                                 "v": b["opt0"]["v"][name]},
                                jnp.asarray(1.0), jnp.asarray(0.01))
            acc = acc + jax.tree_util.tree_leaves(p)[0].ravel()[0]
        return mix(k, acc)
    return step


rows = {}
for probes in (36, 27):
    for prec in (None, "default"):
        rc = mapper.rc._replace(knn_probes=probes, mlp_precision=prec)
        tag = f"probes={probes} mlp={prec or 'highest':7s}"
        rows[(probes, prec)] = chain(tag, s_full(rc))

base = rows[(36, None)]
print("\n| probes | mlp | ms/iter | vs base |")
print("|---|---|---|---|")
for (probes, prec), dt in rows.items():
    print(f"| {probes} | {prec or 'highest'} | {dt*1e3:.2f} | "
          f"{(dt-base)*1e3:+.2f} |")
