"""Tracked-frame fixed costs OUTSIDE the pose loop, at bench scale.

The bench (round 3) shows tracked frames at p50 0.31 s / p90 0.49 s while
the pose loop itself (tracker_cost.py) costs ~0.16 s — so ~0.15 s/frame of
host-side overhead, with heavy jitter. This itemizes a tracked frame the
way map_frame_overhead.py itemizes a mapped one:

  1 radius_maps          (per-frame Sobel + dynamic radius on 680x1200)
  2 frame upload         (jnp.asarray of color/depth when not pre-staged)
  3 initial_pose         (host motion model, numpy)
  4 grad candidates      (only when tracking.sample_with_color_grad)
  5 loop launch+fetch    (track_optimize dispatch + ONE np.asarray RTT)
  6 full track_frame     (end to end, as the bench calls it)

Every stage is forced with np.asarray (axon block_until_ready lies);
N repetitions amortize the launch RTT and report mean + p90 so tunnel
jitter is visible (the bench's 0.17-0.74 s spread).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from point_slam_tpu.config import load_config
from point_slam_tpu.datasets import get_dataset
from point_slam_tpu.mapper import Mapper
from point_slam_tpu.tracker import Tracker, track_optimize
from point_slam_tpu.models import decoders as D
from point_slam_tpu.common import camera

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

cfg = load_config(os.path.join(HERE, "configs", "Synthetic", "room.yaml"),
                  os.path.join(HERE, "configs", "point_slam.yaml"))
cfg["synthetic"].update({"n_frames": 6, "angular_step": 0.01})
cfg["cam"].update({"H": 680, "W": 1200, "fx": 600.0, "fy": 600.0,
                   "cx": 599.5, "cy": 339.5})
# bench composition (bench.py): Replica tracking params
cfg["tracking"].update({"pixels": 1500, "iters": 40,
                        "ignore_edge_W": 100, "ignore_edge_H": 100})
cfg["mapping"].update({"pixels": 5000, "pixels_adding": 6000,
                       "pixels_based_on_color_grad": 1000,
                       "iters": 150, "iters_first": 150,
                       "geo_iter_first": 75, "mapping_window_size": 12})
cfg["rendering"]["sample_near_pcl"] = False
cfg["tpu"].update({"point_capacity_init": 1 << 19})
cfg["verbose"] = False

N = 20


def stat(xs):
    xs = sorted(xs)
    p50 = xs[len(xs) // 2]
    p90 = xs[min(len(xs) - 1, int(round(0.9 * (len(xs) - 1))))]
    return f"p50 {p50*1e3:7.1f} ms  p90 {p90*1e3:7.1f} ms  max {xs[-1]*1e3:7.1f} ms"


def bench_stage(name, fn, n=N):
    fn()  # warm (compile)
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    print(f"{name}: {stat(ts)}", flush=True)
    return ts


def main():
    ds = get_dataset(cfg)
    rng = np.random.default_rng(0)
    params = D.init_decoders(jax.random.key(0), cfg)
    mapper = Mapper(cfg, params, 100, rng)
    tracker = Tracker(cfg, 100)
    _, color, depth, c2w = ds[0]
    mapper.map_frame(0, np.asarray(color), np.asarray(depth),
                     np.asarray(c2w), np.asarray(c2w))
    print(f"mapped ({mapper.n_points_host} pts)", flush=True)

    _, color1, depth1, c2w1 = ds[1]
    _, color2, depth2, c2w2 = ds[2]
    color_np, depth_np = np.asarray(color2), np.asarray(depth2)
    est = np.zeros((100, 4, 4), np.float32)
    est[0] = np.asarray(c2w)
    est[1] = np.asarray(c2w1)

    # 1 radius maps (as bench.py computes per frame, shared tracker/mapper)
    cd = jnp.asarray(color_np)
    bench_stage("1 radius_maps        ",
                lambda: np.asarray(mapper.radius_maps(cd)[1][0, 0]))

    # 2 frame upload (what jnp.asarray costs when the frame is NOT staged)
    bench_stage("2 frame upload       ",
                lambda: np.asarray(jnp.asarray(color_np)[0, 0, 0]))

    # 3 initial_pose (host-only)
    bench_stage("3 initial_pose       ",
                lambda: tracker.initial_pose(2, est, np.asarray(c2w2)))

    # 5 loop launch + single-fetch RTT at the real iteration count
    _, r_query, _, _ = mapper.radius_maps(cd)
    dd = jnp.asarray(depth_np)
    cam_init = jnp.asarray(tracker.initial_pose(2, est, np.asarray(c2w2)))
    n_it = jnp.asarray(tracker.iters)
    key = jax.random.key(3)

    def loop_only():
        out = track_optimize(
            tracker.ts, tracker.rc, mapper.params, mapper.cloud.packed,
            mapper.cloud.n_points, mapper.index, cd, dd, r_query, cam_init,
            jnp.zeros(1, jnp.int32), jnp.zeros(1, bool),
            jnp.asarray(tracker.lr, jnp.float32), n_it, key)
        np.asarray(out[0])
    bench_stage("5 loop launch+fetch  ", loop_only)

    # 5b same loop, but fetching best_cam+losses via ONE concatenated array
    # (track_frame's actual epilogue: pose matrix + 2 scalars)
    def loop_epilogue():
        out = track_optimize(
            tracker.ts, tracker.rc, mapper.params, mapper.cloud.packed,
            mapper.cloud.n_points, mapper.index, cd, dd, r_query, cam_init,
            jnp.zeros(1, jnp.int32), jnp.zeros(1, bool),
            jnp.asarray(tracker.lr, jnp.float32), n_it, key)
        rt = camera.pose_matrix_from_tensor(out[0]).reshape(-1)
        np.asarray(jnp.concatenate([rt, out[2][None], out[3][None]]))
    bench_stage("5b loop+pose epilogue", loop_epilogue)

    # 6 full track_frame as the bench calls it (device-staged frame)
    r_query_np = r_query
    def full():
        tracker.track_frame(2, cd, dd, np.asarray(c2w2), est, mapper,
                            r_query_np)
    bench_stage("6 full track_frame   ", full)

    # 6b full track_frame with HOST numpy frames (upload inside)
    def full_np():
        tracker.track_frame(2, color_np, depth_np, np.asarray(c2w2), est,
                            mapper, r_query_np)
    bench_stage("6b track_frame np-in ", full_np)


if __name__ == "__main__":
    main()
