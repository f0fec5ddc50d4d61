"""Op-level TPU profile of the production SLAM loop.

Two modes:

  capture [outdir]   run a bench-scale PointSLAM for a few frames, then
                     capture a jax.profiler trace around one mapped frame
                     plus its tracked neighbors (the exact production
                     dispatch path, map_optimize chunks included).
  analyze <dir>      parse the captured *.xplane.pb XSpace protos directly
                     (tensorboard_plugin_profile's converter is broken
                     against the image's TF) and print, per device plane
                     line, the top ops by total self duration.

The analyze mode is what the ablation-ladder scripts (iter_breakdown.py)
cannot give: real attribution inside one rung — gather vs scatter vs MXU
vs infeed — instead of rung deltas.
"""
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def capture(outdir: str) -> None:
    import jax
    import numpy as np
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(HERE, ".jax_cache"))
    from point_slam_tpu.config import load_config
    from point_slam_tpu.slam import PointSLAM

    cfg = load_config(
        os.path.join(HERE, "configs", "Synthetic", "room.yaml"),
        os.path.join(HERE, "configs", "point_slam.yaml"))
    # bench.py's workload shapes (H/W/pixels/iters), shorter warmup
    cfg["synthetic"].update({"n_frames": 16, "angular_step": 0.01})
    cfg["cam"].update({"H": 680, "W": 1200, "fx": 600.0, "fy": 600.0,
                       "cx": 599.5, "cy": 339.5})
    cfg["tracking"].update({"pixels": 1500, "iters": 40,
                            "ignore_edge_W": 100, "ignore_edge_H": 100})
    cfg["mapping"].update({
        "pixels": 5000, "pixels_adding": 6000,
        "pixels_based_on_color_grad": 1000, "iters": 300, "iters_first": 300,
        "geo_iter_first": 100, "mapping_window_size": 12, "keyframe_every": 5,
        "every_frame": 5, "lazy_start": False, "color_refine": False,
    })
    cfg["rendering"]["sample_near_pcl"] = False
    cfg["tpu"].update({"point_capacity_init": 1 << 17})  # bench.py's pin
    if os.environ.get("TRACE_SMALL"):  # CPU smoke-test of the capture path
        cfg["cam"].update({"H": 120, "W": 160, "fx": 100.0, "fy": 100.0,
                           "cx": 79.5, "cy": 59.5})
        cfg["tracking"].update({"pixels": 400, "iters": 6,
                                "ignore_edge_W": 10, "ignore_edge_H": 10})
        cfg["mapping"].update({"pixels": 800, "pixels_adding": 1000,
                               "pixels_based_on_color_grad": 200,
                               "iters": 10, "iters_first": 10,
                               "geo_iter_first": 4, "mapping_window_size": 5})
        cfg["tpu"].update({"point_capacity_init": 1 << 15})
    if os.environ.get("TRACE_TPU_OVERRIDES"):
        import json
        cfg["tpu"].update(json.loads(os.environ["TRACE_TPU_OVERRIDES"]))
    cfg["verbose"] = False
    cfg["data"]["output"] = "/tmp/trace_ops_out"

    slam = PointSLAM(cfg)
    for i in range(16):
        slam.dataset[i]

    # bench.py's drive pattern: map frame 0 (compile + init), then the
    # production tracker/mapper calls per frame
    import time
    color, depth, gt = slam._frame(0)
    slam.estimate_c2w_list[0] = gt
    slam.gt_c2w_list[0] = gt
    t0 = time.time()
    slam.mapper.map_frame(0, color, depth, gt, gt)
    print(f"frame 0 mapped in {time.time() - t0:.1f}s "
          f"({slam.mapper.n_points_host} pts)", flush=True)

    def run_frame(idx):
        color, depth, gt = slam._frame(idx)
        gt = np.asarray(gt)
        slam.gt_c2w_list[idx] = gt
        radius = slam.mapper.radius_maps(color)
        res = slam.tracker.track_frame(idx, color, depth, gt,
                                       slam.estimate_c2w_list, slam.mapper,
                                       radius[1])
        slam.estimate_c2w_list[idx] = res["c2w"]
        mapped = idx % cfg["mapping"]["every_frame"] == 0
        if mapped:
            slam.mapper.map_frame(idx, color, depth, gt,
                                  slam.estimate_c2w_list[idx], radius=radius)
        return mapped

    for idx in range(1, 11):   # warm every shape (maps at 5, 10)
        t0 = time.time()
        mapped = run_frame(idx)
        print(f"warm frame {idx} mapped={mapped} {time.time() - t0:.2f}s",
              flush=True)
    np.asarray(slam.mapper.cloud.n_points)  # drain
    print("tracing frames 11..15 (4 tracked + 1 mapped)", flush=True)
    with jax.profiler.trace(outdir):
        for idx in range(11, 16):
            run_frame(idx)
        np.asarray(slam.mapper.cloud.n_points)
    print(f"trace written to {outdir}", flush=True)


def analyze(tracedir: str, top: int = 30) -> None:
    import glob
    import gzip
    from collections import defaultdict
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(tracedir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        sys.exit(f"no *.xplane.pb under {tracedir}")
    for path in paths:
        raw = open(path, "rb").read()
        if raw[:2] == b"\x1f\x8b":
            raw = gzip.decompress(raw)
        space = xplane_pb2.XSpace()
        space.ParseFromString(raw)
        device_planes = [p for p in space.planes
                         if ("TPU" in p.name or "/device:" in p.name
                             or "GPU" in p.name)]
        if not device_planes:  # CPU runs: XLA op events live on /host:CPU
            device_planes = [p for p in space.planes
                             if any(len(ln.events) for ln in p.lines)]
        for plane in device_planes:
            meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
            print(f"\n=== plane: {plane.name} ({os.path.basename(path)})")
            for line in plane.lines:
                agg = defaultdict(lambda: [0, 0])  # name -> [ps, count]
                for ev in line.events:
                    a = agg[meta.get(ev.metadata_id, "?")]
                    a[0] += ev.duration_ps
                    a[1] += 1
                if not agg:
                    continue
                total_ms = sum(a[0] for a in agg.values()) / 1e9
                print(f"\n-- line: {line.name!r}  "
                      f"events={sum(a[1] for a in agg.values())}  "
                      f"busy={total_ms:.3f} ms")
                rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]
                for name, (ps, cnt) in rows:
                    ms = ps / 1e9
                    pct = 100.0 * ps / max(sum(a[0] for a in agg.values()), 1)
                    print(f"  {ms:9.3f} ms {pct:5.1f}%  x{cnt:<6} {name[:110]}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "capture"
    if mode == "capture":
        capture(sys.argv[2] if len(sys.argv) > 2 else "/tmp/trace_ops")
    elif mode == "analyze":
        analyze(sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 30)
    else:
        sys.exit(f"unknown mode {mode}")
