"""Tracker: per-frame camera pose optimization as one compiled while_loop.

TPU-native re-design of the reference Tracker (src/Tracker.py). The whole
per-frame Adam loop over the 7-vector camera tensor (wxyz quaternion +
translation) runs as a single XLA program: pixel sampling, ray generation
differentiable in the pose, fused rendering with differentiable neighbor
distances (decoder.py:143-148), robust outlier masks, and the min-loss
candidate-pose selection.

Parity notes:
* separate_LR uses lr for translation and 0.2*lr for the quaternion
  (src/Tracker.py:295-311); with separate_LR the stored candidate is the
  pre-step camera, otherwise the post-step camera — faithfully mirroring the
  reference's cloning points (src/Tracker.py:332-347).
* robust masks: |d-d_hat|/sqrt(u) < 10*mean (handle_dynamic) or
  |d-d_hat| < 10*median, loss = sum clamp(.,1e3) + w_color*sum|c-c_hat|
  (src/Tracker.py:161-180).
* motion model and quaternion hemisphere alignment against the GT pose
  (src/Tracker.py:283-294) run host-side.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from point_slam_tpu import renderer as R
from point_slam_tpu.common import camera, image, sampling
from point_slam_tpu.ops import adam


class TrackerStatic(NamedTuple):
    h: int
    w: int
    fx: float
    fy: float
    cx: float
    cy: float
    pixels: int
    ignore_edge_w: int
    ignore_edge_h: int
    handle_dynamic: bool
    depth_limit: bool
    use_color: bool
    w_color_loss: float
    separate_lr: bool
    sample_with_color_grad: bool
    grad_top: int
    max_iters: int
    dp: int = 1           # data-parallel devices (rays shard over 'dp')
    bf16_features: bool = False  # render from a bf16 view of the packed
                                 # buffer (encoded ONCE per frame — the map
                                 # is constant during pose optimization)


@functools.partial(jax.jit, static_argnames=("ts", "rc"))
def track_optimize(ts: TrackerStatic, rc: R.RenderConfig,
                   params, packed, n_points, index,
                   gt_color, gt_depth, r_query_map, cam_init,
                   cand_idx, cand_ok, lr, n_iters, key,
                   exposure_feat=None, carry_in=None):
    """Optimize the camera for one frame. Returns (best_cam (7,),
    final_cam (7,), first_loss, best_loss, carry).

    ``carry_in`` resumes a chunked run (vis_inside support: the host splits
    the loop at vis_inside_freq boundaries and fires the visualizer between
    launches, the analog of src/Tracker.py:367-371); iteration semantics are
    identical to one monolithic loop."""
    if ts.bf16_features:
        # one half-width render view per frame; loop-invariant, so every
        # iteration's neighbor gather rides at bf16 bytes
        from point_slam_tpu import pointcloud as pc
        packed = pc.encode_render(packed)

    def loss_fn(cam, it_key):
        c2w = camera.pose_matrix_from_tensor(cam)
        k_pix, k_render = jax.random.split(it_key)
        if ts.sample_with_color_grad:
            pos, ok = sampling.choose_without_replacement(k_pix, cand_ok,
                                                          ts.pixels)
            flat = cand_idx[pos]
            i, j = sampling.flat_to_ij(flat, ts.w)
            valid = ok
        else:
            i, j = sampling.sample_pixels_uniform(
                k_pix, ts.ignore_edge_h, ts.h - ts.ignore_edge_h,
                ts.ignore_edge_w, ts.w - ts.ignore_edge_w, ts.pixels)
            valid = jnp.ones(ts.pixels, bool)
        dep = sampling.gather_pixels(gt_depth, i, j)
        col = sampling.gather_pixels(gt_color, i, j)
        rq = sampling.gather_pixels(r_query_map, i, j)
        valid &= dep > 0
        if ts.depth_limit:
            valid &= dep < 5.0

        rays_o, rays_d = camera.rays_from_uv(i, j, c2w, ts.fx, ts.fy,
                                             ts.cx, ts.cy)
        med = image.masked_median(dep, valid)
        mx = image.masked_max(dep, valid)
        inside = dep <= jnp.minimum(10.0 * med, 1.2 * mx)
        valid &= inside

        if ts.dp > 1:
            # shard the per-ray batch over the dp mesh axis; the pose (and
            # its gradient psum) stays replicated — GSPMD inserts the
            # collectives (SURVEY §2.2 opportunity, mirroring the mapper)
            from point_slam_tpu.parallel import mesh as pmesh
            sh = pmesh.shard_rays(dict(rays_o=rays_o, rays_d=rays_d,
                                       dep=dep, col=col, rq=rq, valid=valid))
            rays_o, rays_d, dep, col, rq, valid = (
                sh["rays_o"], sh["rays_d"], sh["dep"], sh["col"],
                sh["rq"], sh["valid"])

        depth, uncertainty, color, _ = R.render_rays(
            params, packed, n_points, index,
            rays_o, rays_d, dep, rq, valid, k_render, rc,
            stage_color=True, is_tracker=True, exposure_feat=exposure_feat)

        uncertainty = jax.lax.stop_gradient(uncertainty)
        nan_ok = ~(jnp.isnan(depth) | jnp.isnan(uncertainty))
        tmp = jnp.abs(dep - depth) / jnp.sqrt(uncertainty + 1e-10)
        if ts.handle_dynamic:
            thresh_ok = tmp < 10.0 * image.masked_mean(tmp, valid & nan_ok)
        else:
            thresh_ok = jnp.abs(dep - depth) < 10.0 * image.masked_median(
                jnp.abs(dep - depth), valid & nan_ok)
        mask = thresh_ok & (dep > 0) & nan_ok & valid

        geo_loss = jnp.sum(jnp.where(
            mask, jnp.clip(tmp, 0.0, 1e3), 0.0))
        color_loss = jnp.sum(jnp.where(
            mask[:, None], jnp.abs(col - color), 0.0))
        loss = geo_loss
        if ts.use_color:
            loss = loss + ts.w_color_loss * color_loss
        return loss, (geo_loss, color_loss, jnp.sum(mask))

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    cam0 = {"quad": cam_init[:4], "t": cam_init[4:]}
    opt0 = adam.init_state(cam0)

    def body(carry):
        it, cam, opt, best_loss, best_cam, first_loss, key = carry
        key, k_it = jax.random.split(key)
        cam_vec = jnp.concatenate([cam["quad"], cam["t"]])
        (loss, aux), g_vec = grad_fn(cam_vec, k_it)
        grads = {"quad": g_vec[:4], "t": g_vec[4:]}
        t_step = (it + 1).astype(jnp.float32)
        lr_q = lr * 0.2 if ts.separate_lr else lr
        new_q, st_q = adam.update(cam["quad"], grads["quad"],
                                  {"m": opt["m"]["quad"], "v": opt["v"]["quad"]},
                                  t_step, lr_q)
        new_t, st_t = adam.update(cam["t"], grads["t"],
                                  {"m": opt["m"]["t"], "v": opt["v"]["t"]},
                                  t_step, lr)
        new_cam = {"quad": new_q, "t": new_t}
        new_opt = {"m": {"quad": st_q["m"], "t": st_t["m"]},
                   "v": {"quad": st_q["v"], "t": st_t["v"]}}

        stored = (cam_vec if ts.separate_lr
                  else jnp.concatenate([new_q, new_t]))
        better = loss < best_loss
        best_loss = jnp.where(better, loss, best_loss)
        best_cam = jnp.where(better, stored, best_cam)
        first_loss = jnp.where(it == 0, loss, first_loss)
        return (it + 1, new_cam, new_opt, best_loss, best_cam, first_loss, key)

    init = (jnp.zeros((), jnp.int32), cam0, opt0,
            jnp.asarray(1e20, jnp.float32), cam_init,
            jnp.zeros((), jnp.float32), key) if carry_in is None else carry_in
    out = jax.lax.while_loop(
        lambda c: c[0] < jnp.minimum(n_iters, ts.max_iters), body, init)
    _, cam, _, best_loss, best_cam, first_loss, _ = out
    final_cam = jnp.concatenate([cam["quad"], cam["t"]])
    return best_cam, final_cam, first_loss, best_loss, out


class Tracker:
    """Host orchestration: motion model, quaternion init, per-frame optimize."""

    def __init__(self, cfg, n_img: int):
        self.cfg = cfg
        cam = cfg["cam"]
        tr = cfg["tracking"]
        self.n_img = n_img
        dp = int(cfg["tpu"].get("data_parallel", 1) or 1)
        pix = -(-tr["pixels"] // dp) * dp  # pad rays to the dp axis
        bf16 = cfg["tpu"].get("bf16_features", False)
        if bf16 == "auto":
            bf16 = jax.default_backend() not in ("cpu",)
        self.ts = TrackerStatic(
            dp=dp, bf16_features=bool(bf16),
            h=cam["H"], w=cam["W"], fx=cam["fx"], fy=cam["fy"],
            cx=cam["cx"], cy=cam["cy"], pixels=pix,
            ignore_edge_w=tr["ignore_edge_W"], ignore_edge_h=tr["ignore_edge_H"],
            handle_dynamic=tr["handle_dynamic"], depth_limit=tr["depth_limit"],
            use_color=tr["use_color_in_tracking"],
            w_color_loss=tr["w_color_loss"], separate_lr=tr["separate_LR"],
            sample_with_color_grad=tr["sample_with_color_grad"],
            grad_top=min(15 * pix, cam["H"] * cam["W"]),
            max_iters=8 * tr["iters"],
        )
        self.rc = R.make_render_config(cfg, cfg["rendering"]["sigmoid_coef_tracker"])
        self.lr = tr["lr"]
        self.iters = tr["iters"]
        self.gt_camera = tr["gt_camera"]
        self.const_speed = tr["const_speed_assumption"]
        self.key = jax.random.key(cfg["setup_seed"] + 1)
        # set by the orchestrator when tracking.vis_inside is on: called as
        # vis_hook(idx, it, total_iters, cam_vec) between loop chunks
        self.vis_hook = None
        self.inside_freq = max(int(tr.get("vis_inside_freq", 50)), 1)

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def initial_pose(self, idx: int, estimate_c2w_list: np.ndarray,
                     gt_c2w: np.ndarray) -> np.ndarray:
        """Constant-speed motion model + hemisphere-aligned quaternion init
        (src/Tracker.py:283-294)."""
        pre_c2w = estimate_c2w_list[idx - 1].astype(np.float32)
        if self.const_speed and idx >= 2:
            delta = pre_c2w @ np.linalg.inv(
                estimate_c2w_list[idx - 2].astype(np.float32))
            est = delta @ pre_c2w
        else:
            est = pre_c2w
        cam = camera.tensor_from_pose_matrix(est)
        gt_cam = camera.tensor_from_pose_matrix(gt_c2w.astype(np.float32))
        if np.dot(cam[:4], gt_cam[:4]) < 0:
            cam = cam.copy()
            cam[:4] *= -1
        return cam

    def track_frame(self, idx: int, gt_color, gt_depth, gt_c2w,
                    estimate_c2w_list, mapper, r_query_map,
                    exposure_feat=None) -> Dict[str, Any]:
        """Track one frame against the current map; returns dict with c2w."""
        if idx <= 1 or self.gt_camera:
            return {"c2w": np.asarray(gt_c2w, np.float32), "tracked": False}

        color_dev = jnp.asarray(gt_color)
        depth_dev = jnp.asarray(gt_depth)
        cam_init = jnp.asarray(
            self.initial_pose(idx, estimate_c2w_list, gt_c2w))

        if self.ts.sample_with_color_grad:
            grad = image.color_gradient_magnitude(color_dev)
            cand_idx, cand_ok = sampling.top_gradient_candidates(
                grad, self.ts.ignore_edge_h, self.ts.h - self.ts.ignore_edge_h,
                self.ts.ignore_edge_w, self.ts.w - self.ts.ignore_edge_w,
                self.ts.grad_top, depth=depth_dev,
                depth_limit=5.0 if self.ts.depth_limit else None)
        else:
            cand_idx = jnp.zeros(1, jnp.int32)
            cand_ok = jnp.zeros(1, bool)

        exp = (jnp.asarray(exposure_feat)
               if (exposure_feat is not None and self.rc.encode_exposure)
               else None)
        args = (self.ts, self.rc, mapper.params, mapper.cloud.packed,
                mapper.cloud.n_points,
                mapper.index, color_dev, depth_dev, jnp.asarray(r_query_map),
                cam_init, cand_idx, cand_ok, jnp.asarray(self.lr, jnp.float32))
        key = self._next_key()
        if self.vis_hook is None:
            best_cam, final_cam, first_loss, best_loss, _ = track_optimize(
                *args, jnp.asarray(self.iters), key, exposure_feat=exp)
        else:
            # vis_inside: chunk the loop at inside_freq boundaries and fire
            # the visualizer between launches (src/Tracker.py:367-371)
            carry = None
            it = 0
            while it < self.iters:
                end = min(it + self.inside_freq, self.iters)
                best_cam, final_cam, first_loss, best_loss, carry = \
                    track_optimize(*args, jnp.asarray(end), key,
                                   exposure_feat=exp, carry_in=carry)
                it = end
                if it < self.iters:
                    self.vis_hook(idx, it, self.iters, final_cam)

        # one host fetch for everything (each np.asarray is a tunnel RTT)
        rt_flat = camera.pose_matrix_from_tensor(best_cam).reshape(-1)
        vals = np.asarray(jnp.concatenate(
            [rt_flat, first_loss[None], best_loss[None]]))
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :4] = vals[:12].reshape(3, 4)
        return {"c2w": c2w, "tracked": True,
                "first_loss": float(vals[12]), "best_loss": float(vals[13])}
