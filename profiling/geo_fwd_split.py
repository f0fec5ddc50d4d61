"""Fine ablation of the geometry-stage forward between iter_breakdown's
rung 2 (+kNN) and rung 3 (+geo fwd loss): gather, interpolation, MLP,
compositing/losses, and the non-compact fallback — to find where the
~7 ms/iter goes. Same chained fori_loop + host readback scaffolding as
iter_breakdown.py (axon block_until_ready does not block).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from point_slam_tpu.config import load_config
from point_slam_tpu.datasets import get_dataset
from point_slam_tpu.mapper import Mapper, _sample_window_rays, _rays_world, \
    _losses
from point_slam_tpu.models import decoders as D
from point_slam_tpu.ops import knn
from point_slam_tpu import renderer as R
from point_slam_tpu.common.compositing import raw2outputs
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
cloud = mapper.cloud
index = mapper.index
n_frames = jnp.asarray(1)
ppi = jnp.asarray(5000)
N = 30
BIG = dict(window=window, w_c2w=w_c2w, w_exp=w_exp, cloud=cloud, index=index,
           params=mapper.params)


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


def stage_pts(k, b):
    """Common prefix: rays -> z_vals -> sample points -> ray kNN."""
    rays = _sample_window_rays(ms, k, b["window"], n_frames, ppi)
    rays_o, rays_d = _rays_world(rays, b["w_c2w"])
    z, _ = R.build_z_vals(rc, b["index"], rays_o, rays_d,
                          rays["gt_depth"], rays["r_query"], rays["ray_ok"])
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    d, i, v, compact = knn.ray_grid_knn(b["index"], pts, k=rc.nn_num)
    return rays, rays_d, z, pts, d, i, v, compact


def s_knn(k, b):
    _, _, _, _, d, i, v, _ = stage_pts(k, b)
    return mix(k, jnp.where(jnp.isfinite(d), d, 0.0))


def s_fallback(k, b):
    _, _, _, pts, d, idx, valid, compact = stage_pts(k, b)
    ns = rc.n_surface

    def _fb(_):
        i_f, v_f = knn.grid_knn_subset(b["index"], pts, ~compact, k=rc.nn_num)
        rep = jnp.repeat(compact, ns)[:, None]
        return (jnp.where(rep, idx, i_f.reshape(-1, rc.nn_num)),
                jnp.where(rep, valid, v_f.reshape(-1, rc.nn_num)))

    idx, valid = jax.lax.cond(jnp.any(~compact), _fb,
                              lambda _: (idx, valid), operand=None)
    return mix(k, idx)


def make_fwd(upto, with_fallback=False):
    """upto: gather | interp | mlp | full."""
    def step(k, b):
        rays, rays_d, z_vals, pts, d, idx, valid, compact = stage_pts(k, b)
        ns = rc.n_surface
        p = pts.reshape(-1, 3)
        if with_fallback:
            def _fb(_):
                i_f, v_f = knn.grid_knn_subset(b["index"], pts, ~compact,
                                               k=rc.nn_num)
                rep = jnp.repeat(compact, ns)[:, None]
                return (jnp.where(rep, idx, i_f.reshape(-1, rc.nn_num)),
                        jnp.where(rep, valid, v_f.reshape(-1, rc.nn_num)))
            idx, valid = jax.lax.cond(jnp.any(~compact), _fb,
                                      lambda _: (idx, valid), operand=None)
        packed = b["cloud"].packed
        nb = packed[idx]
        neigh_pos = jax.lax.stop_gradient(nb[..., pc.POS_SL])
        diff = neigh_pos - jax.lax.stop_gradient(p)[:, None, :]
        dists = jnp.sum(diff * diff, axis=-1)
        if upto == "gather":
            # sum nb so the full-width gather isn't dead-code-narrowed
            return mix(k, jnp.where(jnp.isfinite(dists), dists, 0.0)
                       + jnp.sum(jnp.where(jnp.isfinite(nb), nb, 0.0)) * 1e-30)
        r_query_pts = jnp.repeat(rays["r_query"], ns)
        counts = knn.neighbor_count(dists, valid, r_query_pts)
        has_neighbors = counts > rc.min_nn_num - 1
        w = D.interpolation_weights(dists, valid, r_query_pts, rc.weighting)
        kg, _ = jax.random.split(k)
        c_geo = jnp.sum(w[..., None] * nb[..., pc.GEO_SL], axis=1)
        c_geo = D.random_fill_features(kg, c_geo, has_neighbors, pc.C_DIM)
        if upto == "interp":
            return mix(k, c_geo)
        occ = D.geo_decoder_apply(b["params"]["geo"], p, c_geo)
        if upto == "mlp":
            return mix(k, occ)
        r = pts.shape[0]
        valid_ray = (jnp.sum(has_neighbors.reshape(r, ns), axis=1)
                     >= (ns // 2 + 1))
        occ = jnp.where(has_neighbors, occ, -100.0)
        rgb = jnp.zeros((p.shape[0], 3), jnp.float32)
        raw = jnp.concatenate([rgb, occ[:, None]], axis=-1).reshape(r, ns, 4)
        dep, unc, col, _ = raw2outputs(raw, z_vals, rays_d,
                                       coef=rc.sigmoid_coef)
        dep = jnp.where(rays["gt_depth"] > 0, dep, 0.0)
        mask = (rays["gt_depth"] > 0) & valid_ray & rays["ray_ok"]
        mask &= ~jnp.isnan(dep)
        loss = jnp.sum(jnp.where(mask, jnp.abs(rays["gt_depth"] - dep), 0.0))
        return mix(k, loss)
    return step


def s_losses(k, b):
    rays = _sample_window_rays(ms, k, b["window"], n_frames, ppi)
    loss, _ = _losses(ms, rc, b["params"], b["cloud"].packed, b["w_exp"],
                      b["cloud"].n_points, b["index"], rays, b["w_c2w"], k,
                      stage_color=False)
    return mix(k, loss)


# how often does the fallback fire on this workload?
k0 = jax.random.key(1)
rays0 = _sample_window_rays(ms, k0, window, n_frames, ppi)
ro, rd = _rays_world(rays0, w_c2w)
z0, _ = R.build_z_vals(rc, index, ro, rd, rays0["gt_depth"],
                       rays0["r_query"], rays0["ray_ok"])
pts0 = ro[:, None, :] + rd[:, None, :] * z0[..., None]
_, _, _, comp0 = knn.ray_grid_knn(index, pts0, k=rc.nn_num)
nc = int(np.asarray(jnp.sum(~comp0)))
print(f"non-compact rays in one batch: {nc} / {comp0.shape[0]}", flush=True)

t_knn = chain("A kNN prefix          ", s_knn)
t_fb = chain("B + fallback cond     ", s_fallback)
t_ga = chain("C + gather+dists      ", make_fwd("gather"))
t_in = chain("D + interp+fill       ", make_fwd("interp"))
t_ml = chain("E + geo MLP           ", make_fwd("mlp"))
t_fl = chain("F + composite+loss    ", make_fwd("full"))
t_fbf = chain("G F w/ fallback       ", make_fwd("full", with_fallback=True))
t_ls = chain("H mapper _losses      ", s_losses)

print(f"\nfallback: {(t_fb-t_knn)*1e3:.2f} | gather+dists: "
      f"{(t_ga-t_fb)*1e3:.2f} | interp: {(t_in-t_ga)*1e3:.2f} | "
      f"geoMLP: {(t_ml-t_in)*1e3:.2f} | composite+loss: "
      f"{(t_fl-t_ml)*1e3:.2f} | fallback-in-full: {(t_fbf-t_fl)*1e3:.2f} | "
      f"_losses-vs-F: {(t_ls-t_fbf)*1e3:.2f}")
