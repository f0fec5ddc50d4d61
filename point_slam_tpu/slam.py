"""PointSLAM orchestrator: the lock-step tracking/mapping schedule.

Single-process re-design of the reference's two-process + manager
architecture (src/Point_SLAM.py). The pipe protocol (SURVEY §3.1) makes the
reference effectively lock-step — mapper maps frame 0, tracker tracks 1..k,
each frame with idx % every_frame == 0 (or the last) is mapped before
tracking proceeds — so a sequential alternation of the two compiled step
functions reproduces its semantics exactly, with the shared decoders/features
passing as plain device arrays instead of CUDA shared memory + RPC.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from point_slam_tpu.datasets import get_dataset
from point_slam_tpu.mapper import Mapper
from point_slam_tpu.models import decoders as D
from point_slam_tpu.tracker import Tracker


def update_cam(cfg) -> None:
    """Apply crop_size / crop_edge to the intrinsics in place
    (src/Point_SLAM.py:121-141)."""
    cam = cfg["cam"]
    if "crop_size" in cam and cam["crop_size"] is not None:
        ch, cw = cam["crop_size"]
        sx, sy = cw / cam["W"], ch / cam["H"]
        cam["fx"] *= sx
        cam["fy"] *= sy
        cam["cx"] *= sx
        cam["cy"] *= sy
        cam["W"], cam["H"] = cw, ch
    e = cam.get("crop_edge") or 0
    if e > 0:
        cam["H"] -= 2 * e
        cam["W"] -= 2 * e
        cam["cx"] -= e
        cam["cy"] -= e


class PointSLAM:
    def __init__(self, cfg, input_folder: Optional[str] = None,
                 output: Optional[str] = None):
        self.cfg = cfg
        update_cam(cfg)
        if output:
            cfg["data"]["output"] = output
        self.output = cfg["data"]["output"]
        os.makedirs(self.output, exist_ok=True)
        os.makedirs(os.path.join(self.output, "ckpts"), exist_ok=True)
        os.makedirs(os.path.join(self.output, "mesh"), exist_ok=True)

        self.dataset = get_dataset(cfg, input_folder)
        self.n_img = len(self.dataset)
        self.verbose = cfg.get("verbose", True)

        rng = np.random.default_rng(cfg["setup_seed"])
        params = D.init_decoders(jax.random.key(cfg["setup_seed"]), cfg)
        pretrained = cfg.get("pretrained_decoders", {}).get("middle_fine", "")
        if pretrained and not os.path.isabs(pretrained) and \
                not os.path.exists(pretrained):
            # resolve config-relative artifact paths against the repo root so
            # `pretrained/middle_fine.npz` works regardless of CWD
            root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            if os.path.exists(os.path.join(root, pretrained)):
                pretrained = os.path.join(root, pretrained)
        params = D.load_pretrained_geo(params, pretrained)
        if cfg["mapping"].get("fix_geo_decoder") and not (
                pretrained and os.path.exists(pretrained)):
            # the reference freezes a PRETRAINED NICE-SLAM middle decoder
            # (src/Point_SLAM.py:143-164); freezing a random one would pin
            # geometry to feature-only fitting, so train it instead
            cfg["mapping"]["fix_geo_decoder"] = False
            if self.verbose:
                print("[init] no pretrained geo decoder found -> training it "
                      "(reference freezes a pretrained one)")

        self.mapper = Mapper(cfg, params, self.n_img, rng)
        self.tracker = Tracker(cfg, self.n_img)

        self.estimate_c2w_list = np.zeros((self.n_img, 4, 4), np.float32)
        self.gt_c2w_list = np.zeros((self.n_img, 4, 4), np.float32)
        # Wall-clock attribution (VERDICT r4 #6: wall_active must ≈ Σ phases).
        # Main-thread buckets (disjoint, sum to wall_active up to `other`):
        #   track/map  — the two optimization phases
        #   wait       — blocked on the prefetch worker (host/data starvation)
        #   log        — visualizer panels, metrics sink, ckpt saves, dumps
        #   io         — direct dataset[] fetches on the main thread (frame 0)
        #   other      — measured per-frame remainder (pose writes, python)
        # Worker-side counters (OVERLAPPED with device compute, reported
        # separately, not part of the wall sum): prefetch_fetch/prefetch_stage.
        self.timing: Dict[str, float] = {
            "track": 0.0, "map": 0.0, "io": 0.0, "wait": 0.0, "log": 0.0,
            "other": 0.0}

        from point_slam_tpu.utils.mlog import MetricsLogger
        self.mlog = MetricsLogger(self.output, cfg,
                                  name=f"slam_{cfg.get('scene', 'scene')}")

        from point_slam_tpu.utils.visualizer import Visualizer
        self.track_vis = Visualizer(
            cfg["tracking"]["vis_freq"], cfg["tracking"]["vis_inside_freq"],
            os.path.join(self.output, "tracking_vis"), verbose=self.verbose,
            vis_inside=bool(cfg["tracking"].get("vis_inside", False)))
        self.map_vis = Visualizer(
            cfg["mapping"]["vis_freq"], cfg["mapping"]["vis_inside_freq"],
            os.path.join(self.output, "mapping_vis"), verbose=self.verbose,
            vis_inside=bool(cfg["mapping"].get("vis_inside", False)),
            img_dir=os.path.join(self.output, "rendered_image")
            if cfg["mapping"]["save_rendered_image"] else None)

        # vis_inside: fire the visualizers from INSIDE the optimization
        # loops at chunk boundaries (src/Tracker.py:367-371,
        # src/Mapper.py:441-445)
        if self.map_vis.vis_inside:
            self._map_vis_frame = {}

            def _map_hook(idx, it_prev, it_now, n_iters, cur_c2w):
                depth, color = self._map_vis_frame.get(idx, (None, None))
                if depth is None:
                    return
                self.map_vis.vis_chunk(idx, it_prev, it_now, n_iters,
                                       self.mapper, cur_c2w, depth, color)
            self.mapper.vis_hook = _map_hook
        if self.track_vis.vis_inside:
            self._track_vis_frame = {}

            def _track_hook(idx, it, total, cam_vec):
                depth, color = self._track_vis_frame.get(idx, (None, None))
                if depth is None or idx % self.track_vis.freq != 0:
                    return
                from point_slam_tpu.common import camera as _cam
                c2w = np.eye(4, dtype=np.float32)
                c2w[:3, :4] = np.asarray(
                    _cam.pose_matrix_from_tensor(cam_vec))
                self.track_vis.vis(idx, it, total, self.mapper, c2w,
                                   depth, color, freq_override=True)
            self.tracker.vis_hook = _track_hook

    def _frame(self, idx):
        t0 = time.perf_counter()
        _, color, depth, c2w = self.dataset[idx]
        self.timing["io"] += time.perf_counter() - t0
        return color, depth, c2w

    def run(self, stop: Optional[int] = None, progress: bool = True,
            resume_from: Optional[str] = None) -> Dict[str, Any]:
        cfg = self.cfg
        # optional device trace: set tpu.profile_dir to capture a
        # jax.profiler trace of the whole run (view with tensorboard /
        # xprof). Complements the per-phase wall-clock timers in
        # self.timing (SURVEY §5: the reference only has perf_counter
        # prints, src/Mapper.py:409,570-596).
        profile_dir = cfg.get("tpu", {}).get("profile_dir")
        if profile_dir:
            jax.profiler.start_trace(profile_dir)
        try:
            return self._run(stop, progress, resume_from)
        finally:
            if profile_dir:
                jax.profiler.stop_trace()

    def _run(self, stop: Optional[int] = None, progress: bool = True,
             resume_from: Optional[str] = None) -> Dict[str, Any]:
        t_run0 = time.perf_counter()
        cfg = self.cfg
        n = self.n_img if stop is None else min(stop + 1, self.n_img)
        every = cfg["mapping"]["every_frame"]
        lazy = cfg["mapping"]["lazy_start"] or 0
        color_refine = cfg["mapping"]["color_refine"]
        ckpt_freq = cfg["mapping"].get("ckpt_freq") or 0

        start = 1
        if resume_from:
            from point_slam_tpu.utils.logger import load_checkpoint, \
                restore_slam
            start = restore_slam(self, load_checkpoint(resume_from))
            if self.verbose:
                print(f"[resume] from {resume_from}: continuing at frame "
                      f"{start} with {self.mapper.n_points_host} points")
        else:
            # frame 0: mapped unconditionally with the GT pose
            # (Mapper.py:660-677)
            color, depth, gt_c2w = self._frame(0)
            self.estimate_c2w_list[0] = gt_c2w
            self.gt_c2w_list[0] = gt_c2w
            t0 = time.perf_counter()
            st = self.mapper.map_frame(0, color, depth, gt_c2w, gt_c2w)
            self.timing["map"] += time.perf_counter() - t0
            if self.verbose:
                print(f"[map] frame 0: +{st['n_added']} locations, "
                      f"{st['n_iters']} iters, geo {st['geo_loss']:.3f}")

        from point_slam_tpu.utils.prefetch import FramePrefetcher
        from point_slam_tpu.common import image as image_ops

        inv_scale = jnp.asarray(self.dataset.depth_inv_scale)

        def _stage(item):
            # upload in the WORKER thread so the transfer overlaps device
            # compute, and at WIRE width (one (H,W,5) u8 put: 4.1 MB vs
            # 13.1 MB f32 + two puts at Replica scale); decode_wire_frame
            # dequantizes on device to the exact f32 values dataset[i]
            # returns on host. The per-frame dynamic radius maps are ALSO
            # dispatched here: they depend only on color, and launching
            # them from the worker keeps their ~40 ms link round-trip off
            # the tracked-frame critical path.
            i, packed, c2w = item
            color, depth = image_ops.decode_wire_frame(
                jax.device_put(packed), inv_scale)
            return (i, color, depth, self.mapper.radius_maps(color), c2w)

        prefetcher = FramePrefetcher(
            self.dataset, depth=int(cfg["tpu"].get("prefetch_depth", 4)),
            start=start, stop=n, stage=_stage, fetch=self.dataset.wire)
        tm = self.timing
        pf_iter = iter(prefetcher)
        while True:
            t0 = time.perf_counter()
            try:
                frame_idx, color, depth, radius, gt_c2w = next(pf_iter)
            except StopIteration:
                break
            tm["wait"] += time.perf_counter() - t0
            t_frame0 = time.perf_counter()
            acc0 = tm["track"] + tm["map"] + tm["log"]
            idx = int(frame_idx)
            self.gt_c2w_list[idx] = gt_c2w
            ef = 1 if (lazy and idx <= lazy) else every

            # dynamic radius maps: computed ONCE per frame (in the prefetch
            # worker), shared by tracker, mapper and visualizer
            r_add, r_query = radius[0], radius[1]

            if self.track_vis.vis_inside:
                self._track_vis_frame = {idx: (depth, color)}
            if self.map_vis.vis_inside:
                self._map_vis_frame = {idx: (depth, color)}

            t0 = time.perf_counter()
            res = self.tracker.track_frame(
                idx, color, depth, gt_c2w, self.estimate_c2w_list,
                self.mapper, r_query,
                exposure_feat=self.mapper.exposure_feat)
            tm["track"] += time.perf_counter() - t0
            self.estimate_c2w_list[idx] = res["c2w"]
            if res.get("tracked"):
                if self.verbose:
                    print(f"[track] frame {idx}: loss "
                          f"{res['first_loss']:.2f}->{res['best_loss']:.2f}")
                t0 = time.perf_counter()
                self.mlog.log({"idx_track": idx,
                               "track_first_loss": res["first_loss"],
                               "track_best_loss": res["best_loss"]})
                tm["log"] += time.perf_counter() - t0

            if idx % ef == 0 or idx == n - 1:
                refine = color_refine and idx == n - 1 and idx == self.n_img - 1
                t0 = time.perf_counter()
                st = self.mapper.map_frame(idx, color, depth, gt_c2w,
                                           self.estimate_c2w_list[idx],
                                           color_refine=refine,
                                           radius=radius)
                tm["map"] += time.perf_counter() - t0
                # BA refines the current pose during mapping (Mapper.py:735-737)
                self.estimate_c2w_list[idx] = st["cur_c2w"]
                if self.verbose:
                    print(f"[map] frame {idx}: +{st['n_added']} locations, "
                          f"{st['n_iters']} iters, geo {st['geo_loss']:.3f}, "
                          f"col {st['color_loss']:.3f}, "
                          f"pts {st['n_points']}")
                t0 = time.perf_counter()
                self.mlog.log({"idx_map": idx, **{k: v for k, v in st.items()
                                                  if k != "cur_c2w"}})
                # with vis_inside the end-of-frame panel is redundant
                # except on frame 0 (src/Mapper.py:598-603)
                if not self.map_vis.vis_inside or idx == 0:
                    panel = self.map_vis.vis(
                        idx, st["n_iters"] - 1, st["n_iters"],
                        self.mapper, self.estimate_c2w_list[idx],
                        depth, color,
                        save_rendered_image=cfg["mapping"][
                            "save_rendered_image"],
                        r_query=r_query)
                    self.mlog.log_image("mapping_vis", panel, step=idx)
                if ckpt_freq and idx % ckpt_freq == 0 and idx != n - 1:
                    from point_slam_tpu.utils.logger import save_checkpoint
                    save_checkpoint(os.path.join(
                        self.output, "ckpts", f"{idx:05d}.npz"), self, idx)
                # periodic Object3D mirror every 300 mapped-frame indices
                # (src/Mapper.py:756-763: wandb log only; the npy/ply files
                # are written solely at the final frame)
                if idx > 0 and idx % 300 == 0 and idx != n - 1:
                    try:
                        self._dump_point_cloud(log_points_step=idx,
                                               write_files=False)
                    except Exception as e:  # pragma: no cover
                        print("point cloud dump failed:", e)
                tm["log"] += time.perf_counter() - t0
            elif res.get("tracked"):
                t0 = time.perf_counter()
                panel = self.track_vis.vis(
                    idx, self.tracker.iters - 1,
                    self.tracker.iters, self.mapper,
                    self.estimate_c2w_list[idx], depth, color,
                    r_query=r_query)
                self.mlog.log_image("tracking_vis", panel, step=idx)
                tm["log"] += time.perf_counter() - t0
            # per-frame remainder (pose writes, python glue) so the
            # breakdown sums: frame wall - (track+map+log this frame)
            tm["other"] += (time.perf_counter() - t_frame0
                            - (tm["track"] + tm["map"] + tm["log"] - acc0))

        # final point-cloud artifacts (src/Mapper.py:756-772): surface input
        # points with rgb as npy+ply, neural point positions as npy
        t0 = time.perf_counter()
        try:
            self._dump_point_cloud(log_points_step=n - 1)
        except Exception as e:  # pragma: no cover
            print("point cloud dump failed:", e)
        tm["log"] += time.perf_counter() - t0

        # worker-side I/O counters (overlapped with device compute — NOT a
        # wall_active component; they attribute what the `wait` bucket was
        # blocked on when nonzero)
        tm["prefetch_fetch"] = getattr(prefetcher, "time_fetch", 0.0)
        tm["prefetch_stage"] = getattr(prefetcher, "time_stage", 0.0)
        tm["wall_active"] = time.perf_counter() - t_run0
        from point_slam_tpu.utils.memory import memory_report
        self.mlog.log({"final_n_points": self.mapper.n_points_host,
                       **{f"time_{k}": v for k, v in self.timing.items()},
                       **{f"mem_{k}": v for k, v in memory_report().items()}})
        return {
            "n_frames": n,
            "n_points": self.mapper.n_points_host,
            "keyframes": list(self.mapper.keyframe_list),
            "timing": dict(self.timing),
            "estimate_c2w_list": self.estimate_c2w_list[:n],
            "gt_c2w_list": self.gt_c2w_list[:n],
        }

    def _dump_point_cloud(self, log_points_step: int = -1,
                          write_files: bool = True) -> None:
        """Point-cloud dump (src/Mapper.py:756-772 parity): the reference
        logs a wandb Object3D of the surface input points at every
        idx%300==0 mapped frame, and writes the final_point_cloud npy/ply
        files ONLY at the last frame. Periodic callers therefore pass
        write_files=False (metrics-sink mirror only); the end-of-run caller
        writes the files too."""
        m = self.mapper
        ni = int(m.cloud.n_inputs)
        npts = m.n_points_host
        cloud_pos = np.asarray(m.cloud.input_pos[:ni])
        cloud_rgb = np.asarray(m.cloud.input_rgb[:ni])
        if write_files:
            np.save(os.path.join(self.output, "final_point_cloud"),
                    np.hstack([cloud_pos, cloud_rgb]))
            np.save(os.path.join(self.output, "npc_cloud"),
                    np.asarray(m.cloud.pos[:npts]))
            from point_slam_tpu.utils.ply import write_ply
            ply_path = os.path.join(self.output, "final_point_cloud.ply")
            write_ply(ply_path, cloud_pos, colors=cloud_rgb / 255.0)
            self.mlog.log({"final_point_cloud_ply": ply_path})
        if log_points_step >= 0:
            # the reference's wandb.Object3D mirror (src/Mapper.py:770-772)
            self.mlog.log_points("input_pc", cloud_pos, cloud_rgb,
                                 step=log_points_step)
