"""End-to-end per-iteration cost of the mapping/tracking steps at Replica scale.

Times map_optimize with two different n_iters values; the difference isolates
per-iteration cost from fixed overhead. Sync via host readback (axon's
block_until_ready does not wait).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from point_slam_tpu.config import load_config
from point_slam_tpu.datasets import get_dataset
from point_slam_tpu.mapper import Mapper, map_optimize
from point_slam_tpu.tracker import Tracker
from point_slam_tpu.models import decoders as D

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
cfg["tracking"].update({"pixels": 1500, "iters": 40})
cfg["rendering"]["sample_near_pcl"] = False
cfg["tpu"].update({"point_capacity_init": 1 << 19})
cfg["verbose"] = False

ds = get_dataset(cfg)
rng = np.random.default_rng(0)
params = D.init_decoders(jax.random.key(0), cfg)
mapper = Mapper(cfg, params, 100, rng)

_, color, depth, c2w = ds[0]
color = np.asarray(color); depth = np.asarray(depth); c2w = np.asarray(c2w)

t0 = time.time()
st = mapper.map_frame(0, color, depth, c2w, c2w)
# force: fetch a feature value
np.asarray(mapper.cloud.geo_feats[0])
print(f"frame0 map_frame wall (incl compile, {cfg['mapping']['iters_first']} iters): "
      f"{time.time()-t0:.1f}s   n_points={st['n_points']}")

# inflate the cloud to steady-state scale (~300k points) for realistic timing
CAP = mapper.cloud.pos.shape[0]
NPTS = 300_000
u = rng.uniform(0, 6, (NPTS, 2)).astype(np.float32)
pts = np.stack([u[:, 0], u[:, 1],
                2.0 + 0.3 * np.sin(u[:, 0] * 3)
                + 0.01 * rng.standard_normal(NPTS).astype(np.float32)], -1)
pos = np.full((CAP, 3), 1e6, np.float32)
pos[:NPTS] = pts
import point_slam_tpu.pointcloud as pc
mapper.cloud = mapper.cloud._replace(
    pos=jnp.asarray(pos),
    n_points=jnp.asarray(NPTS, jnp.int32),
    geo_feats=jnp.asarray(0.1 * rng.standard_normal((CAP, 32)), jnp.float32),
    col_feats=jnp.asarray(0.1 * rng.standard_normal((CAP, 32)), jnp.float32))
mapper.n_points_host = NPTS
mapper.index = pc.build_index(mapper.cloud, mapper.cell_size,
                              mapper.table_size, mapper.max_per_cell)


def run_optimize(n_iters):
    f = mapper.ms.f_max
    slots = jnp.zeros((f,), jnp.int32)
    cd = jnp.asarray(color); dd = jnp.asarray(depth)
    r_add, r_query, _, _ = mapper.radius_maps(cd)
    w_color = mapper.ring.color[slots].at[0].set(cd)
    w_depth = mapper.ring.depth[slots].at[0].set(dd)
    w_rq = mapper.ring.r_query[slots].at[0].set(r_query)
    w_c2w = mapper.ring.est_c2w[slots].at[0].set(jnp.asarray(c2w))
    w_exp = mapper.ring.exposure[slots]
    frustum = jnp.arange(CAP) < mapper.cloud.n_points
    lr = jnp.asarray([0.001, 0.03, 0.0], jnp.float32)
    lrc = jnp.asarray([0.005, 0.005, 0.005], jnp.float32)
    out = map_optimize(
        mapper.ms, mapper.rc, mapper.params, mapper.cloud.geo_feats,
        mapper.cloud.col_feats, mapper.cloud.pos, mapper.cloud.n_points,
        mapper.index, w_color, w_depth, w_rq, w_c2w, w_exp,
        jnp.asarray(10), jnp.asarray(500), jnp.asarray(9), frustum,
        lr, lrc, jnp.asarray(0.001), jnp.asarray(1.0),
        jnp.asarray(n_iters // 2), jnp.asarray(n_iters), jax.random.key(1))
    return np.asarray(out[1][0])  # fetch forces completion


for n in (2, 2, 52, 52):
    t0 = time.time()
    run_optimize(n)
    print(f"map_optimize n_iters={n}: {time.time()-t0:.2f}s")

t2 = min(time.time() for _ in [0])  # noop
ts = {}
for n in (2, 52):
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        run_optimize(n)
        best = min(best, time.time() - t0)
    ts[n] = best
per_iter = (ts[52] - ts[2]) / 50
print(f"mapping per-iteration: {per_iter*1e3:.1f} ms  "
      f"(fixed overhead {ts[2]:.2f}s)")

# tracker
tracker = Tracker(cfg, 100)
r_add, r_query, _, _ = mapper.radius_maps(jnp.asarray(color))
est = np.tile(np.eye(4, dtype=np.float32), (100, 1, 1))
est[0] = c2w; est[1] = c2w

t0 = time.time()
res = tracker.track_frame(2, color, depth, c2w, est, mapper, r_query)
print(f"track_frame first (compile, 40 it): {time.time()-t0:.1f}s")
best = 1e9
for _ in range(3):
    t0 = time.time()
    res = tracker.track_frame(2, color, depth, c2w, est, mapper, r_query)
    best = min(best, time.time() - t0)
print(f"track_frame steady (40 it x 1500 rays): {best:.2f}s "
      f"({best/40*1e3:.1f} ms/iter)")
