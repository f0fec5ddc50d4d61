"""Numerical probe of the color path: activations + grad norms (CPU)."""
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
print("pts:", int(mapper.cloud.n_points))

# one ray batch
from point_slam_tpu.common import sampling, camera, image
key = jax.random.key(5)
i, j = sampling.sample_pixels_uniform(key, 0, 240, 0, 320, 2000)
gt_d = sampling.gather_pixels(dd, i, j)
gt_c = sampling.gather_pixels(cd, i, j)
rq = sampling.gather_pixels(r_query, i, j)
rays_o, rays_d = camera.rays_from_uv(i, j, cw, 200.0, 200.0, 159.5, 119.5)
ok = gt_d > 0


def color_loss_fn(diff):
    depth_r, unc, col_r, valid_ray = R.render_rays(
        {"geo": mapper.params["geo"], "col": diff["col"]}, diff["packed"],
        mapper.cloud.n_points, mapper.index, rays_o, rays_d, gt_d, rq, ok,
        jax.random.key(7), mapper.rc, stage_color=True)
    mask = ok & valid_ray & (gt_d > 0)
    closs = jnp.sum(jnp.where(mask[:, None], jnp.abs(gt_c - col_r), 0.0))
    return closs, (col_r, mask)


diff = {"col": mapper.params["col"], "packed": mapper.cloud.packed}
(closs, (col_r, mask)), grads = jax.value_and_grad(
    color_loss_fn, has_aux=True)(diff)
print(f"color loss {float(closs):.2f} over {int(mask.sum())} rays")
print("rendered color stats: min %.3f max %.3f mean %.3f std %.3f" % (
    float(col_r.min()), float(col_r.max()), float(col_r.mean()),
    float(jnp.std(col_r))))
print("gt color mean %.3f std %.3f" % (float(gt_c.mean()), float(jnp.std(gt_c))))

g = grads["packed"]
print("grad packed col cols: %.3e (geo cols %.3e, pos cols %.3e)" % (
    float(jnp.abs(g[:, pc.COL_SL]).sum()),
    float(jnp.abs(g[:, pc.GEO_SL]).sum()),
    float(jnp.abs(g[:, pc.POS_SL]).sum())))
for name, leaf in [("output_linear.w", grads["col"]["output_linear"]["w"]),
                   ("pts_linears0.w", grads["col"]["pts_linears"][0]["w"]),
                   ("fc_c0.w", grads["col"]["fc_c"][0]["w"]),
                   ("mlp_col_neighbor.l1.w",
                    grads["col"]["mlp_col_neighbor"]["l1"]["w"])]:
    print(f"grad col.{name}: {float(jnp.abs(leaf).sum()):.3e}")

# pre-sigmoid magnitude probe
p = {"geo": mapper.params["geo"], "col": mapper.params["col"]}
depth_r, unc, col_r2, vr = R.render_rays(
    p, mapper.cloud.packed, mapper.cloud.n_points, mapper.index,
    rays_o, rays_d, gt_d, rq, ok, jax.random.key(7), mapper.rc,
    stage_color=True, apply_sigmoid_color=False)
print("pre-sigmoid color: min %.2f max %.2f mean %.2f std %.2f" % (
    float(col_r2.min()), float(col_r2.max()), float(col_r2.mean()),
    float(jnp.std(col_r2))))
