"""Ablation ladder for the mapping iteration cost at Replica scale.

Each rung adds one pipeline stage; chained fori_loop + host readback gives
per-iteration cost (axon block_until_ready does not block).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from point_slam_tpu.config import load_config
from point_slam_tpu.datasets import get_dataset
from point_slam_tpu.mapper import Mapper, _sample_window_rays, _losses
from point_slam_tpu.models import decoders as D
from point_slam_tpu.ops import adam, knn
from point_slam_tpu import renderer as R
import point_slam_tpu.pointcloud as pc  # noqa

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
# env overrides so the ladder can run at bench-matched shapes
# (IB_CAP=131072 IB_NPTS=22500 matches the round-5 bench workload)
import os as _os
_CAP_INIT = int(_os.environ.get("IB_CAP", 1 << 19))
cfg["tpu"].update({"point_capacity_init": _CAP_INIT})
cfg["verbose"] = False

ds = get_dataset(cfg)
rng = np.random.default_rng(0)
params = D.init_decoders(jax.random.key(0), cfg)
mapper = Mapper(cfg, params, 100, rng)
_, color, depth, c2w = ds[0]

# realistic 300k-point cloud
CAP = mapper.cloud.pos.shape[0]
NPTS = int(_os.environ.get("IB_NPTS", 300_000))
u = rng.uniform(-2.5, 2.5, (NPTS, 2)).astype(np.float32)
pts = np.stack([u[:, 0], u[:, 1],
                -2.0 + 0.3 * np.sin(u[:, 0] * 3)], -1).astype(np.float32)
pos = np.full((CAP, 3), 1e6, np.float32)
pos[:NPTS] = pts
mapper.cloud = mapper.cloud._replace(
    packed=mapper.cloud.packed.at[:, pc.POS_SL].set(jnp.asarray(pos)),
    n_points=jnp.asarray(NPTS, jnp.int32))
mapper.index = pc.build_index(mapper.cloud, mapper.cell_size,
                              mapper.table_size, mapper.max_per_cell)

ms, rc = mapper.ms, mapper.rc
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
# compacted row selection, as map_frame builds it (power-of-two bucket)
m_rows = min(1 << int(np.ceil(np.log2(max(NPTS, 1024)))), CAP)
sel_rows = jnp.nonzero(frustum, size=m_rows, fill_value=CAP)[0]
sel_rows = jnp.where(sel_rows >= CAP,
                     CAP + jnp.arange(m_rows, dtype=sel_rows.dtype),
                     sel_rows).astype(jnp.int32)
cloud = mapper.cloud
index = mapper.index
n_frames = jnp.asarray(1)
ppi = jnp.asarray(5000)

N = 30


BIG = {}  # name -> device array pytree, passed as jit args (closures are
          # uploaded with the remote-compile request on axon: HTTP 413)

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


diff0 = {"col": mapper.params["col"], "packed": cloud.packed}
opt0 = adam.init_state(diff0)
rows0 = jnp.take(cloud.packed, sel_rows, axis=0, mode="fill", fill_value=0.0,
                 unique_indices=True, indices_are_sorted=True)
diff_r = {"col": mapper.params["col"], "rows": rows0}
opt_r = adam.init_state(diff_r)
BIG.update(window=window, w_c2w=w_c2w, w_exp=w_exp, cloud=cloud, index=index,
           params=mapper.params, frustum=frustum, diff0=diff0, opt0=opt0,
           sel=sel_rows, diff_r=diff_r, opt_r=opt_r)


# rung 1: ray sampling only
def s_sample(k, b):
    rays = _sample_window_rays(ms, k, b["window"], n_frames, ppi)
    return mix(k, rays["dirs_cam"])

# rung 2: + kNN over the ray samples
def s_knn(k, b):
    rays = _sample_window_rays(ms, k, b["window"], n_frames, ppi)
    from point_slam_tpu.mapper import _rays_world
    rays_o, rays_d = _rays_world(rays, b["w_c2w"])
    z, _ = R.build_z_vals(rc, b["index"], rays_o,
                          rays_d, rays["gt_depth"], rays["r_query"],
                          rays["ray_ok"])
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    if rc.ray_knn:
        d, i, v, _ = knn.ray_grid_knn(b["index"], pts, k=rc.nn_num)
    else:
        d, i, v = knn.grid_knn(b["index"], pts.reshape(-1, 3), k=rc.nn_num)
    return mix(k, jnp.where(jnp.isfinite(d), d, 0.0))

# rung 3: + full geometry-stage forward loss
def s_geo_fwd(k, b):
    rays = _sample_window_rays(ms, k, b["window"], n_frames, ppi)
    loss, _ = _losses(ms, rc, b["params"], b["cloud"].packed, b["w_exp"],
                      b["cloud"].n_points, b["index"], rays, b["w_c2w"], k,
                      stage_color=False)
    return mix(k, loss)

# rung 4: + color-stage forward loss
def s_col_fwd(k, b):
    rays = _sample_window_rays(ms, k, b["window"], n_frames, ppi)
    loss, _ = _losses(ms, rc, b["params"], b["cloud"].packed, b["w_exp"],
                      b["cloud"].n_points, b["index"], rays, b["w_c2w"], k,
                      stage_color=True)
    return mix(k, loss)


def make_grad(stage_color):
    def loss_fn(diff, b, rays, kk):
        p = {"col": diff["col"], "geo": b["params"]["geo"]}
        return _losses(ms, rc, p, diff["packed"],
                       b["w_exp"], b["cloud"].n_points,
                       b["index"], rays, b["w_c2w"], kk,
                       stage_color=stage_color)
    return jax.grad(lambda d, b, r, kk: loss_fn(d, b, r, kk)[0])

grad_geo = make_grad(False)
grad_col = make_grad(True)

# rung 5: geometry grad
def s_geo_grad(k, b):
    rays = _sample_window_rays(ms, k, b["window"], n_frames, ppi)
    g = grad_geo(b["diff0"], b, rays, k)
    return mix(k, g["packed"][0])

# rung 6: color grad
def s_col_grad(k, b):
    rays = _sample_window_rays(ms, k, b["window"], n_frames, ppi)
    g = grad_col(b["diff0"], b, rays, k)
    return mix(k, g["packed"][0])

# rung 7: FULL-BUFFER style (round-1): color grad + frustum mask + adam over
# the whole (CAP,72) buffer
def s_full(k, b):
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


# rung 8: COMPACTED-ROW style (round-2, what map_optimize now runs): the
# diff leaf is packed[sel] (M,72); compose via scatter in the forward, adam
# sweeps only M rows
def grad_col_rows(d, b, rays, kk):
    def loss_fn(d):
        p = {"col": d["col"], "geo": b["params"]["geo"]}
        packed = b["cloud"].packed.at[b["sel"]].set(
            d["rows"], mode="drop", unique_indices=True,
            indices_are_sorted=True)
        return _losses(ms, rc, p, packed, b["w_exp"], b["cloud"].n_points,
                       b["index"], rays, b["w_c2w"], kk,
                       stage_color=True)[0]
    return jax.grad(loss_fn)(d)


def s_full_rows(k, b):
    rays = _sample_window_rays(ms, k, b["window"], n_frames, ppi)
    g = grad_col_rows(b["diff_r"], b, rays, k)
    acc = 0.0
    for name in ("col", "rows"):
        p, st = adam.update(b["diff_r"][name], g[name],
                            {"m": b["opt_r"]["m"][name],
                             "v": b["opt_r"]["v"][name]},
                            jnp.asarray(1.0), jnp.asarray(0.01))
        acc = acc + jax.tree_util.tree_leaves(p)[0].ravel()[0]
    return mix(k, acc)


# rung 9: FULL-BUFFER step with the fused Pallas row-Adam for the packed
# leaf (mask + moments + step in one HBM sweep; ops/adam.update_rows)
def s_full_fused(k, b):
    rays = _sample_window_rays(ms, k, b["window"], n_frames, ppi)
    g = grad_col(b["diff0"], b, rays, k)
    p_col, _ = adam.update(b["diff0"]["col"], g["col"],
                           {"m": b["opt0"]["m"]["col"],
                            "v": b["opt0"]["v"]["col"]},
                           jnp.asarray(1.0), jnp.asarray(0.01))
    t_row = jnp.ones((g["packed"].shape[1],), jnp.float32)
    lr_row = jnp.full((g["packed"].shape[1],), 0.01, jnp.float32)
    p_pk, _ = adam.update_rows(b["diff0"]["packed"], g["packed"],
                               {"m": b["opt0"]["m"]["packed"],
                                "v": b["opt0"]["v"]["packed"]},
                               t_row, lr_row, b["frustum"])
    acc = jax.tree_util.tree_leaves(p_col)[0].ravel()[0] + p_pk[0, 0]
    return mix(k, acc)


# rung 10: FULL-BUFFER step with the bf16 render view (tpu.bf16_features):
# loss renders from pc.encode_render(packed) — gather + backward scatter-add
# at half bytes; frustum mask + XLA adam stay f32 on the master
def grad_col_bf16(d, b, rays, kk):
    def loss_fn(d):
        p = {"col": d["col"], "geo": b["params"]["geo"]}
        return _losses(ms, rc, p, pc.encode_render(d["packed"]),
                       b["w_exp"], b["cloud"].n_points,
                       b["index"], rays, b["w_c2w"], kk,
                       stage_color=True)[0]
    return jax.grad(loss_fn)(d)


def s_full_bf16(k, b):
    rays = _sample_window_rays(ms, k, b["window"], n_frames, ppi)
    g = grad_col_bf16(b["diff0"], b, rays, k)
    g["packed"] = g["packed"] * b["frustum"][:, None]
    acc = 0.0
    for name in ("col", "packed"):
        p, st = adam.update(b["diff0"][name], g[name],
                            {"m": b["opt0"]["m"][name],
                             "v": b["opt0"]["v"][name]},
                            jnp.asarray(1.0), jnp.asarray(0.01))
        acc = acc + jax.tree_util.tree_leaves(p)[0].ravel()[0]
    return mix(k, acc)


t1 = chain("1 sample rays        ", s_sample)
t2 = chain("2 + kNN              ", s_knn)
t3 = chain("3 + geo fwd loss     ", s_geo_fwd)
t4 = chain("4 + col fwd loss     ", s_col_fwd)
t5 = chain("5 geo grad           ", s_geo_grad)
t6 = chain("6 col grad           ", s_col_grad)
t7 = chain("7 full-buffer step   ", s_full)
t8 = chain("8 compacted-row step ", s_full_rows)
t9 = chain("9 fused-adam step    ", s_full_fused)
t10 = chain("10 bf16-view step    ", s_full_bf16)
print(f"\nkNN cost: {(t2-t1)*1e3:.1f} ms | geo-MLP fwd: {(t3-t2)*1e3:.1f} | "
      f"col extras fwd: {(t4-t3)*1e3:.1f} | geo bwd: {(t5-t3)*1e3:.1f} | "
      f"col bwd: {(t6-t4)*1e3:.1f} | adam: {(t7-t6)*1e3:.1f} | "
      f"compaction saves: {(t7-t8)*1e3:.1f} ms/iter | "
      f"fused-adam saves: {(t7-t9)*1e3:.1f} ms/iter | "
      f"bf16-view saves: {(t7-t10)*1e3:.1f} ms/iter")
