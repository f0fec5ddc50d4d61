"""Mapper: per-frame scene optimization as a single compiled XLA program.

TPU-native re-design of the reference Mapper (src/Mapper.py). Per mapped
frame the host orchestrates (dynamic radius maps, keyframe-window selection,
point densification, frustum feature selection, iteration budgeting), then a
single jit — a `lax.while_loop` over the joint iterations — runs the whole
two-stage (geometry -> color) Adam optimization on device: ray sampling from
the device-resident keyframe window, fused rendering, masked losses, and
per-group Adam updates with the reference's LR schedule driven by traced
scalars (no recompiles across frames/stages/iteration budgets).

Parity map:
* keyframe overlap selection      src/Mapper.py:170-235
* densification + iteration scale src/Mapper.py:306-331,404-406
* frustum feature selection       src/Mapper.py:120-168,342-356 (gradient mask)
* two-stage loop + LR schedule    src/Mapper.py:408-439
* ray batches + robust masks      src/Mapper.py:447-553
* exposure affine per keyframe    src/Mapper.py:529-548 (per-ray gather)
* color refinement                src/Mapper.py:706-726
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from point_slam_tpu import pointcloud as pc
from point_slam_tpu import renderer as R
from point_slam_tpu.common import camera, image, sampling
from point_slam_tpu.models import decoders as D
from point_slam_tpu.ops import adam, knn


class MapperStatic(NamedTuple):
    """Hashable statics for the mapping jit."""
    h: int
    w: int
    fx: float
    fy: float
    cx: float
    cy: float
    r_max: int            # ray batch size == mapping.pixels
    f_max: int            # window slots
    w_color_loss: float
    frustum_edge: float
    fix_geo_decoder: bool
    encode_exposure: bool
    n_add: int
    near_end_surface_pc: float
    far_end_surface_pc: float
    add_max: int          # candidate rays for uniform densification
    grad_max: int         # candidate rays for color-grad densification
    grad_top: int         # top-k pool for color-grad selection
    max_iters: int        # safety bound for the while_loop
    dp: int = 1           # data-parallel devices (rays shard over 'dp')
    ba: bool = False      # bundle adjustment: optimize window cameras
    fused_adam: bool = False  # Pallas fused row-Adam for the packed leaf
    bf16_features: bool = False  # render from a bf16 view of the packed
                                 # buffer (pc.encode_render); Adam master
                                 # and moments stay f32


@functools.partial(jax.jit, donate_argnums=(0,))
def ring_set(ring: jnp.ndarray, slot, wire: jnp.ndarray) -> jnp.ndarray:
    """Write one wire-encoded keyframe into the (K,H,W,5) u8 device ring."""
    return ring.at[slot].set(wire)


@functools.partial(jax.jit,
                   static_argnames=("dyn", "r_add_max", "r_add_min",
                                    "ratio", "thr", "rq_fixed"))
def decode_window(wire: jnp.ndarray, valid: jnp.ndarray, inv_scale,
                  dyn: bool, r_add_max: float, r_add_min: float,
                  ratio: float, thr: float, rq_fixed: float):
    """(F,H,W,5) u8 wire window -> (color f32, depth f32, r_query f32).

    r_query is RECOMPUTED from the decoded color (it is a pure function of
    color — image.dynamic_radius_maps — so storing it would spend 3.3 MB/
    keyframe of HBM and 44% more host-ring upload bytes to cache a
    sub-millisecond batched Sobel). Padding slots (``valid`` False) get the
    1e6 sentinel the old f32 ring initialized with."""
    color, depth = jax.vmap(
        lambda p: image.decode_wire_frame(p, inv_scale))(wire)
    if dyn:
        rq = jax.vmap(lambda c: image.dynamic_radius_maps(
            c, r_add_max, r_add_min, ratio, thr)[1])(color)
    else:
        rq = jnp.full(depth.shape, rq_fixed, jnp.float32)
    rq = jnp.where(valid[:, None, None], rq, 1e6)
    return color, depth, rq


class KeyframeStore:
    """Keyframe database. Poses/exposures (small) are host numpy; images are
    held WIRE-ENCODED ((H,W,5) u8 — see datasets.wire; 4.1 MB/keyframe at
    Replica scale vs 16.4 MB for the f32 color+depth+r_query triple it
    replaces; r_query is recomputed from color at gather time) in one of
    two backends:

    * device ring (default): all keyframes live in HBM; the window is a
      device gather + one batched decode — zero per-frame upload. At wire
      width the default budget (1024 slots, 4.2 GB) covers ScanNet-length
      sequences outright.
    * host ring (``tpu.keyframe_host_ring``: true, or 'auto' when the
      expected keyframe count exceeds ``tpu.keyframe_device_budget``):
      wire frames stay in host memory and only the selected window
      (<= 2*mapping_window_size+2 slots) is uploaded per mapped frame.
      This lifts the device-budget cap entirely — the reference likewise
      keeps keyframe images on CPU (src/Mapper.py:741-751).

    Appending past a full device ring raises instead of silently dropping
    the keyframe.
    """

    def __init__(self, cfg, h: int, w: int, n_img: int, exposure_dim: int,
                 keyframe_every: int):
        tpu = cfg["tpu"]
        expected = n_img // max(keyframe_every, 1) + 4
        budget = int(tpu["keyframe_device_budget"])
        mode = tpu.get("keyframe_host_ring", "auto")
        self.host_mode = (expected > budget if mode == "auto" else bool(mode))
        self.h, self.w = h, w
        self.exposure_dim = exposure_dim
        self.est_c2w = []      # list of (4,4) f32 — BA writes back here
        self.gt_c2w = []
        self.exposure = []
        self.frames = []       # host mode: list of (H,W,5) u8 wire arrays
        # wire codec statics (decode_window / encode_wire_frame)
        self.depth_scale = jnp.asarray(
            np.float32(cfg["cam"]["png_depth_scale"]))
        self.inv_scale = jnp.asarray(
            np.float32(1.0 / float(cfg["cam"]["png_depth_scale"])))
        pcfg = cfg["pointcloud"]
        self.dyn = bool(cfg["use_dynamic_radius"])
        self.rq_statics = dict(
            dyn=self.dyn,
            r_add_max=pcfg["radius_add_max"], r_add_min=pcfg["radius_add_min"],
            ratio=pcfg["radius_query_ratio"], thr=pcfg["color_grad_threshold"],
            rq_fixed=pcfg["radius_query"])
        if not self.host_mode:
            self.capacity = max(min(budget, expected), 4)
            self.ring = jnp.zeros((self.capacity, h, w, 5), jnp.uint8)

    def __len__(self):
        return len(self.est_c2w)

    def append(self, color_dev, depth_dev, est_c2w, gt_c2w,
               exposure) -> None:
        slot = len(self.est_c2w)
        wire = image.encode_wire_frame(color_dev, depth_dev, self.depth_scale)
        if self.host_mode:
            # 4.1 MB fetch instead of 16.4 MB of f32 arrays
            self.frames.append(np.asarray(wire, np.uint8))
        else:
            if slot >= self.capacity:
                raise RuntimeError(
                    f"keyframe ring overflow: keyframe #{slot + 1} exceeds "
                    f"the device ring capacity {self.capacity} "
                    f"(tpu.keyframe_device_budget). Set "
                    f"tpu.keyframe_host_ring: true (or leave it 'auto') to "
                    f"keep keyframe images in host memory.")
            self.ring = ring_set(self.ring, jnp.asarray(slot), wire)
        self.est_c2w.append(np.asarray(est_c2w, np.float32))
        self.gt_c2w.append(np.asarray(gt_c2w, np.float32))
        self.exposure.append(np.asarray(exposure, np.float32))

    def set_est_c2w(self, slot: int, c2w) -> None:
        self.est_c2w[slot] = np.asarray(c2w, np.float32)

    def est_c2w_array(self) -> np.ndarray:
        return (np.stack(self.est_c2w) if self.est_c2w
                else np.zeros((0, 4, 4), np.float32))

    def exposure_array(self) -> np.ndarray:
        return (np.stack(self.exposure) if self.exposure
                else np.zeros((0, self.exposure_dim), np.float32))

    def est_c2w_padded(self, min_pad: int = 64) -> jnp.ndarray:
        """(K',4,4) device poses padded to power-of-two shapes so the
        overlap-score jit recompiles O(log K) times over a run."""
        n = len(self.est_c2w)
        k = max(min_pad, 1 << max(n - 1, 0).bit_length())
        arr = np.tile(np.eye(4, dtype=np.float32), (k, 1, 1))
        if n:
            arr[:n] = np.stack(self.est_c2w)
        return jnp.asarray(arr)

    def gather_window(self, sel, f_max: int):
        """Window arrays (f_max leading dim) for keyframe slots ``sel``;
        slots past len(sel) are left as padding (caller writes the current
        frame at position len(sel); rays from further slots are masked by
        n_frames)."""
        if self.host_mode:
            wire_np = np.zeros((f_max, self.h, self.w, 5), np.uint8)
            for k, s in enumerate(sel):
                wire_np[k] = self.frames[s]
            w_wire = jnp.asarray(wire_np)
        else:
            slots = jnp.asarray((list(sel) + [0] * (f_max - len(sel)))[:f_max],
                                jnp.int32)
            w_wire = self.ring[slots]
        valid = np.zeros((f_max,), bool)
        valid[:len(sel)] = True
        w_color, w_depth, w_rq = decode_window(
            w_wire, jnp.asarray(valid), self.inv_scale, **self.rq_statics)
        c2w = np.tile(np.eye(4, dtype=np.float32), (f_max, 1, 1))
        exp = np.zeros((f_max, self.exposure_dim), np.float32)
        for k, s in enumerate(sel):
            c2w[k] = self.est_c2w[s]
            exp[k] = self.exposure[s]
        return w_color, w_depth, w_rq, jnp.asarray(c2w), jnp.asarray(exp)


# ------------------------------------------------------------ keyframe overlap

@functools.partial(jax.jit, static_argnames=("ms", "n_samples", "pixels"))
def overlap_scores(ms: MapperStatic, ring_est_c2w, n_kf, cur_c2w, gt_color,
                   gt_depth, key, n_samples: int = 8, pixels: int = 200):
    """Fraction of current-frame surface samples inside each keyframe frustum
    (src/Mapper.py:170-235). Returns (K,) scores; slots >= n_kf get -1."""
    h, w = ms.h, ms.w
    i, j = sampling.sample_pixels_uniform(key, 0, h, 0, w, pixels)
    dep = sampling.gather_pixels(gt_depth, i, j)
    ok = dep > 0
    rays_o, rays_d = camera.rays_from_uv(i, j, cur_c2w, ms.fx, ms.fy, ms.cx, ms.cy)
    t = jnp.linspace(0.0, 1.0, n_samples)
    near = (dep * 0.8)[:, None]
    far = (dep + 0.5)[:, None]
    z = near * (1 - t)[None, :] + far * t[None, :]
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    pts = pts.reshape(-1, 3)
    pt_ok = jnp.repeat(ok, n_samples)

    def score_one(c2w):
        w2c = jnp.linalg.inv(c2w)
        u, v, zc = camera.project_points(pts, w2c, ms.fx, ms.fy, ms.cx, ms.cy)
        edge = 20
        m = ((u < w - edge) & (u > edge) & (v < h - edge) & (v > edge)
             & (zc < 0) & pt_ok)
        return jnp.sum(m) / jnp.maximum(jnp.sum(pt_ok), 1)

    scores = jax.vmap(score_one)(ring_est_c2w)
    k = ring_est_c2w.shape[0]
    return jnp.where(jnp.arange(k) < n_kf, scores, -1.0)


# ----------------------------------------------------------- frame preparation

@functools.partial(jax.jit, static_argnames=("r_add_max", "r_add_min",
                                             "ratio", "thr", "grad_top"))
def prepare_frame(color, r_add_max: float, r_add_min: float,
                  ratio: float, thr: float, grad_top: int):
    """Dynamic radius maps + color-gradient candidate pool for one frame."""
    r_add, r_query = image.dynamic_radius_maps(color, r_add_max, r_add_min,
                                               ratio, thr)
    grad = image.color_gradient_magnitude(color)
    h, w = grad.shape
    cand_idx, cand_ok = sampling.top_gradient_candidates(
        grad, 0, h, 0, w, grad_top)
    return r_add, r_query, cand_idx, cand_ok


# -------------------------------------------------------------- the main jit

def _sample_window_rays(ms: MapperStatic, key, window, n_frames,
                        pixs_per_image):
    """One iteration's ray batch from the keyframe window (device).

    window: dict with color (F,H,W,3), depth, r_query.
    Returns dict of (R,) arrays + per-ray slot + camera-space dirs +
    validity. World rays are assembled later by `_rays_world` from the
    (possibly BA-optimized, differentiable) per-slot poses.
    """
    rmax = ms.r_max
    slot = jnp.arange(rmax) // jnp.maximum(pixs_per_image, 1)
    ray_ok = slot < n_frames
    slot = jnp.minimum(slot, ms.f_max - 1)
    ki, kj = jax.random.split(key)
    i = jax.random.randint(ki, (rmax,), 0, ms.w).astype(jnp.int32)
    j = jax.random.randint(kj, (rmax,), 0, ms.h).astype(jnp.int32)
    col = window["color"][slot, j, i]
    dep = window["depth"][slot, j, i]
    rq = window["r_query"][slot, j, i]
    dirs = jnp.stack([(i.astype(jnp.float32) - ms.cx) / ms.fx,
                      -(j.astype(jnp.float32) - ms.cy) / ms.fy,
                      -jnp.ones((rmax,), jnp.float32)], -1)
    ray_ok &= dep > 0                                       # depth_filter
    med = image.masked_median(dep, ray_ok)
    mx = image.masked_max(dep, ray_ok)
    inside = dep <= jnp.minimum(10.0 * med, 1.2 * mx)       # Mapper.py:507-509
    ray_ok &= inside
    rays = dict(dirs_cam=dirs, gt_depth=dep, gt_color=col,
                r_query=rq, slot=slot, ray_ok=ray_ok)
    if ms.dp > 1:
        from point_slam_tpu.parallel import mesh as pmesh
        rays = pmesh.shard_rays(rays)
    return rays


def _rays_world(rays, c2w_all):
    """World-space ray origins/directions from per-slot poses (R,4,4)/(F,4,4).
    Differentiable in c2w_all (the BA path optimizes window cameras)."""
    c2w = c2w_all[rays["slot"]]
    rays_d = jnp.einsum("rkl,rl->rk", c2w[:, :3, :3], rays["dirs_cam"])
    rays_o = c2w[:, :3, 3]
    return rays_o, rays_d


def _losses(ms: MapperStatic, rc: R.RenderConfig, params, packed,
            window_exposure, n_points, index, rays, c2w_all, key,
            stage_color: bool):
    """Masked geometry(+color) losses for one ray batch. Returns
    (loss, (geo_loss, color_loss, n_mask)). With BA, c2w_all carries the
    differentiable window poses; is_tracker makes neighbor distances
    differentiable so pose gradients flow (src/Mapper.py:515-521)."""
    rays_o, rays_d = _rays_world(rays, c2w_all)
    depth, uncertainty, color, valid_ray = R.render_rays(
        params, packed, n_points, index,
        rays_o, rays_d, rays["gt_depth"], rays["r_query"],
        rays["ray_ok"], key, rc, stage_color=stage_color,
        is_tracker=ms.ba, apply_sigmoid_color=not ms.encode_exposure)

    mask = (rays["gt_depth"] > 0) & valid_ray & rays["ray_ok"]
    mask &= ~jnp.isnan(depth)
    geo_loss = jnp.sum(jnp.where(mask, jnp.abs(rays["gt_depth"] - depth), 0.0))
    loss = geo_loss
    color_loss = jnp.zeros(())
    if stage_color:
        if ms.encode_exposure:
            rot, trans = D.exposure_affine(params["col"], window_exposure)
            color = jnp.einsum("rk,rkl->rl", color, rot[rays["slot"]]) \
                + trans[rays["slot"]]
            color = jax.nn.sigmoid(color)
        color_loss = jnp.sum(jnp.where(
            mask[:, None], jnp.abs(rays["gt_color"] - color), 0.0))
        loss = loss + ms.w_color_loss * color_loss
    return loss, (geo_loss, color_loss, jnp.sum(mask))


@functools.partial(
    jax.jit, static_argnames=("ms", "rc"),
    # chunked launches re-feed the (CAP,72) packed leaf plus two same-shape
    # Adam moments (~450 MB at CAP=2^19) every max_iters_per_launch
    # iterations; donating them lets XLA alias input->output instead of
    # copying. The host caller never reuses these inputs after the call
    # (self.cloud/self.params are swapped to the outputs); first-chunk
    # opt_in=None donates nothing.
    donate_argnames=("packed", "window_exposure", "opt_in"))
def map_optimize(ms: MapperStatic, rc: R.RenderConfig,
                 params, packed, n_points, index,
                 window_color, window_depth, window_rquery, window_c2w,
                 window_exposure, n_frames, pixs_per_image, cur_slot,
                 frustum, lr_geo_stage, lr_color_stage, lr_exposure,
                 fix_color, geo_iter_bound, n_iters, key,
                 it0=None, opt_in=None,
                 cams0=None, ba_mask=None, lr_ba=None,
                 ba_lo=None, ba_hi=None):
    """The per-frame mapping optimization: while_loop over joint iterations.

    The cloud state rides as ONE packed (CAP, 72) leaf (geo|col|pos columns,
    pointcloud layout): a single neighbor gather in the forward, a single
    scatter-add in the backward, and a single Adam pass with a per-COLUMN
    learning-rate row (geometry columns get geometry_lr, color columns
    color_lr, position columns 0 — positions also carry stop_gradient, so
    their moments stay exactly zero and they never move). Frustum feature
    selection (src/Mapper.py:342-356) is a GRADIENT MASK over the full
    buffer, not a compacted leaf: a compacted packed[sel] variant was
    measured 10 ms/iter SLOWER at 300k points (indexed gather/scatter
    overhead swamps the ~2 ms full-buffer Adam sweep, and its
    power-of-two row buckets forced multi-minute recompiles mid-run) —
    see profiling/iter_breakdown.py rungs 7 vs 8.

    Traced knobs: LR triples [decoders, geometry_feats, color_feats] for each
    stage, the geometry/color switch iteration, the iteration count, the
    frustum gradient mask, and a 0/1 multiplier freezing the color decoder
    (color refinement). Returns updated (params, packed,
    window_exposure, stats, opt_state, key).

    ``it0``/``opt_in`` resume a chunked run: the host splits long frames into
    launches of <= tpu.max_iters_per_launch iterations each (a single XLA
    program running for minutes gets killed by the runtime watchdog), carrying
    the Adam state and PRNG key across launches. Iteration semantics are
    identical to one monolithic loop.
    """
    window = dict(color=window_color, depth=window_depth, r_query=window_rquery)

    diff0 = {"col": params["col"], "packed": packed,
             "exposure": window_exposure}
    if not ms.fix_geo_decoder:
        diff0["geo"] = params["geo"]
    if ms.ba:
        diff0["cams"] = cams0                              # (F, 7) quat+trans
    opt0 = adam.init_state(diff0) if opt_in is None else opt_in
    if it0 is None:
        it0 = jnp.zeros((), jnp.int32)

    def build_params(diff):
        p = {"col": diff["col"],
             "geo": diff.get("geo", params["geo"])}
        return p

    def window_poses(diff):
        if not ms.ba:
            return window_c2w
        rt = jax.vmap(camera.pose_matrix_from_tensor)(diff["cams"])  # (F,3,4)
        bottom = jnp.tile(jnp.asarray([[0., 0., 0., 1.]], jnp.float32),
                          (rt.shape[0], 1, 1))
        return jnp.concatenate([rt, bottom], axis=1)

    def loss_fn(diff, rays, it_key, stage_color):
        p = build_params(diff)
        # bf16 render view: halves the bytes of the neighbor row gather and
        # the backward scatter-add; the f32 master (and Adam moments) are
        # untouched — grads arrive f32 through encode_render's backward
        pk = (pc.encode_render(diff["packed"]) if ms.bf16_features
              else diff["packed"])
        return _losses(ms, rc, p, pk,
                       diff["exposure"], n_points, index, rays,
                       window_poses(diff), it_key, stage_color)

    grad_geo = jax.value_and_grad(
        lambda d, r, k: loss_fn(d, r, k, False), has_aux=True)
    grad_col = jax.value_and_grad(
        lambda d, r, k: loss_fn(d, r, k, True), has_aux=True)

    exp_onehot = (jnp.arange(window_exposure.shape[0]) == cur_slot
                  ).astype(jnp.float32)[:, None]
    col_ones = jnp.zeros((pc.PACK_W,), jnp.float32)
    geo_cols = col_ones.at[pc.GEO_SL].set(1.0)
    col_cols = col_ones.at[pc.COL_SL].set(1.0)

    def body(carry):
        it, diff, opt, key, _stats = carry
        key, k_rays, k_render = jax.random.split(key, 3)
        rays = _sample_window_rays(ms, k_rays, window, n_frames,
                                   pixs_per_image)
        stage_geo = it <= geo_iter_bound
        (loss, aux), grads = jax.lax.cond(
            stage_geo,
            lambda d: grad_geo(d, rays, k_render),
            lambda d: grad_col(d, rays, k_render),
            diff)

        # gradient masking: frustum-selected features only; exposure only for
        # the current frame; color decoder frozen during refinement
        if not ms.fused_adam:
            # fused path folds the frustum row mask into the Adam kernel
            grads["packed"] = grads["packed"] * frustum[:, None].astype(
                jnp.float32)
        grads["exposure"] = grads["exposure"] * exp_onehot
        grads["col"] = jax.tree_util.tree_map(lambda g: g * fix_color,
                                              grads["col"])
        if ms.ba:
            # the oldest keyframe stays fixed to anchor the map
            # (src/Mapper.py:379-380); padding slots are masked too
            grads["cams"] = grads["cams"] * ba_mask[:, None]

        lrs = jnp.where(stage_geo, lr_geo_stage, lr_color_stage)
        lr_packed = geo_cols * lrs[1] + col_cols * lrs[2]   # (PACK_W,) row
        # torch parity: Adam's step count is per param group, starting at the
        # group's FIRST gradient (torch skips grad-None params). Color-path
        # groups see their first gradient at the geometry->color switch, so
        # their bias correction restarts there — without this, early color
        # steps are ~1.35x larger (v under-corrected) and the color MLP can
        # saturate irrecoverably on unlucky PRNG streams.
        t_geo = (it + 1).astype(jnp.float32)
        t_col = jnp.maximum(it - geo_iter_bound, 1).astype(jnp.float32)
        t_packed = geo_cols * t_geo + col_cols * t_col \
            + (1.0 - geo_cols - col_cols) * t_geo           # (PACK_W,) row

        new_diff = dict(diff)
        new_opt = dict(m=dict(opt["m"]), v=dict(opt["v"]))

        def step_group(name, lr, t):
            p, st = adam.update(
                diff[name], grads[name],
                {"m": opt["m"][name], "v": opt["v"][name]}, t, lr)
            new_diff[name] = p
            new_opt["m"][name] = st["m"]
            new_opt["v"][name] = st["v"]

        step_group("col", lrs[0], t_col)
        if not ms.fix_geo_decoder:
            step_group("geo", lrs[0], t_geo)
        if ms.fused_adam:
            p, st = adam.update_rows(
                diff["packed"], grads["packed"],
                {"m": opt["m"]["packed"], "v": opt["v"]["packed"]},
                t_packed, lr_packed, frustum)
            new_diff["packed"] = p
            new_opt["m"]["packed"] = st["m"]
            new_opt["v"]["packed"] = st["v"]
        else:
            step_group("packed", lr_packed, t_packed)
        step_group("exposure", lr_exposure, t_col)
        if ms.ba:
            # BA cams move only in iters [(ratio+0.2)N, (ratio+0.3)N]
            # (src/Mapper.py:434-439)
            lr_cam = jnp.where((it >= ba_lo) & (it <= ba_hi), lr_ba, 0.0)
            step_group("cams", lr_cam, t_geo)

        geo_l, col_l, n_mask = aux
        stats = jnp.stack([geo_l, col_l, n_mask.astype(jnp.float32)])
        return (it + 1, new_diff, new_opt, key, stats)

    def cond(carry):
        return carry[0] < jnp.minimum(n_iters, ms.max_iters)

    init = (jnp.asarray(it0, jnp.int32), diff0, opt0, key, jnp.zeros(3))
    it_out, diff, opt, key_out, stats = jax.lax.while_loop(cond, body, init)

    out_params = build_params(diff)
    return (out_params, diff["packed"],
            diff["exposure"], stats, opt, key_out,
            diff.get("cams"))


# ------------------------------------------------------------------ densify

@functools.partial(jax.jit, static_argnames=("ms",))
def sample_add_rays(ms: MapperStatic, key, c2w, gt_color, gt_depth, r_add,
                    n_rays):
    """Uniform candidate rays for densification (src/Mapper.py:306-313):
    add_max static candidates, first n_rays (traced) marked valid."""
    i, j = sampling.sample_pixels_uniform(key, 0, ms.h, 0, ms.w, ms.add_max)
    valid = jnp.arange(ms.add_max) < n_rays
    rays_o, rays_d = camera.rays_from_uv(i, j, c2w, ms.fx, ms.fy, ms.cx, ms.cy)
    dep = sampling.gather_pixels(gt_depth, i, j)
    col = sampling.gather_pixels(gt_color, i, j)
    ra = sampling.gather_pixels(r_add, i, j)
    return rays_o, rays_d, dep, col, ra, valid


@functools.partial(jax.jit, static_argnames=("ms",))
def sample_grad_rays(ms: MapperStatic, key, c2w, gt_color, gt_depth, r_add,
                     cand_idx, cand_ok):
    """Color-gradient candidate rays (src/Mapper.py:322-331 via
    src/common.py:92-114): grad_max distinct picks from the top-grad pool."""
    pos, ok = sampling.choose_without_replacement(key, cand_ok, ms.grad_max)
    flat = cand_idx[pos]
    i, j = sampling.flat_to_ij(flat, ms.w)
    rays_o, rays_d = camera.rays_from_uv(i, j, c2w, ms.fx, ms.fy, ms.cx, ms.cy)
    dep = sampling.gather_pixels(gt_depth, i, j)
    col = sampling.gather_pixels(gt_color, i, j)
    ra = sampling.gather_pixels(r_add, i, j)
    return rays_o, rays_d, dep, col, ra, ok


# ----------------------------------------------------------------- host class

class Mapper:
    """Host orchestration of per-frame mapping. Owns the cloud, the keyframe
    ring, and the decoder parameters."""

    def __init__(self, cfg, params, n_img: int, rng: np.random.Generator):
        self.cfg = cfg
        self.params = params
        self.n_img = n_img
        self.rng = rng

        cam = cfg["cam"]
        h, w = cam["H"], cam["W"]
        mp = cfg["mapping"]
        pcfg = cfg["pointcloud"]
        window = mp["mapping_window_size"] * (2 if n_img > 4000 else 1)
        self.window = window
        f_max = 2 * window + 2  # color refinement doubles the window

        dp = int(cfg["tpu"].get("data_parallel", 1) or 1)
        r_max = -(-mp["pixels"] // dp) * dp  # pad rays to the dp axis
        fused = cfg["tpu"].get("fused_adam", "auto")
        if fused == "auto":
            # interpret-mode Pallas on CPU is for tests only; the fused
            # kernel pays off on real hardware
            fused = jax.default_backend() not in ("cpu",)
        bf16 = cfg["tpu"].get("bf16_features", False)
        if bf16 == "auto":
            # CPU keeps the all-f32 path (determinism golden; metric parity)
            bf16 = jax.default_backend() not in ("cpu",)
        self.ms = MapperStatic(
            fused_adam=bool(fused),
            bf16_features=bool(bf16),
            h=h, w=w, fx=cam["fx"], fy=cam["fy"], cx=cam["cx"], cy=cam["cy"],
            r_max=r_max, f_max=f_max, dp=dp,
            w_color_loss=mp["w_color_loss"], frustum_edge=mp["frustum_edge"],
            fix_geo_decoder=mp["fix_geo_decoder"],
            encode_exposure=cfg["model"]["encode_exposure"],
            n_add=pcfg["N_add"],
            near_end_surface_pc=pcfg["near_end_surface"],
            far_end_surface_pc=pcfg["far_end_surface"],
            add_max=mp["pixels_adding"] * 3,
            grad_max=max(mp["pixels_based_on_color_grad"], 1),
            grad_top=min(5 * max(mp["pixels_based_on_color_grad"], 1),
                         h * w),
            max_iters=4 * max(mp["iters"], mp["iters_first"]),
        )
        self.rc = R.make_render_config(cfg, cfg["rendering"]["sigmoid_coef_mapper"])

        cap = cfg["tpu"]["point_capacity_init"]
        self.cloud = pc.init_cloud(cap, cfg["model"]["c_dim"], pcfg["N_add"])
        self.n_points_host = 0
        self.cell_size = (pcfg["radius_query_ratio"] * pcfg["radius_add_max"]
                          if cfg["use_dynamic_radius"] else
                          max(pcfg["radius_query"], pcfg["radius_add"]))
        self.table_size = cfg["tpu"]["grid_table_size"]
        self.max_per_cell = cfg["tpu"]["grid_max_per_cell"]
        packed = cfg["tpu"].get("knn_packed_coords", False)
        if packed == "auto":
            # CPU keeps the f32 planes (determinism golden; metric parity)
            packed = jax.default_backend() not in ("cpu",)
        # 'fused' keeps the string; True/False/auto stay boolean
        self.packed_coords = packed if packed == "fused" else bool(packed)
        self.index = pc.build_index(self.cloud, self.cell_size,
                                    self.table_size, self.max_per_cell,
                                    self.packed_coords)

        self.store = KeyframeStore(cfg, h, w, n_img,
                                   cfg["model"]["exposure_dim"],
                                   mp["keyframe_every"])
        self.keyframe_list = []          # frame indices
        self.selected_keyframes = {}
        self.refine_mode = False         # set per map_frame (color_refine)
        self.exposure_feat = 0.01 * rng.standard_normal(
            cfg["model"]["exposure_dim"]).astype(np.float32)
        self.exposure_feat_all = []
        self.color_decoder_snapshots = []   # per mapped frame, exposure only

        # set by the orchestrator when mapping.vis_inside is on: called as
        # vis_hook(idx, it_prev, it_now, n_iters, cur_c2w) at chunk
        # boundaries of the optimization loop (src/Mapper.py:441-445 analog)
        self.vis_hook = None
        self.dyn = cfg["use_dynamic_radius"]
        self.pseed = cfg["setup_seed"]
        self.key = jax.random.key(cfg["setup_seed"])
        self.frame_stats = {}

    # -- helpers ----------------------------------------------------------

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def _ensure_capacity(self, worst_new: int):
        cap = self.cloud.pos.shape[0]
        cap_max = self.cfg["tpu"]["point_capacity_max"]
        grew = False
        while self.n_points_host + worst_new > cap and cap < cap_max:
            cap *= 2
            self.cloud = pc.grow_cloud(self.cloud, cap, self.ms.n_add)
            grew = True
        if self.n_points_host + worst_new > cap:
            raise RuntimeError("neural point cloud capacity exceeded")
        if grew:
            # keep hash-bucket occupancy bounded (~8 points/bucket mean):
            # an overfull bucket silently drops points past max_per_cell,
            # which would break densification dedup on large scenes
            while self.table_size < cap // 8:
                self.table_size *= 2
            self.index = pc.build_index(self.cloud, self.cell_size,
                                        self.table_size, self.max_per_cell,
                                        self.packed_coords)

    def radius_maps(self, color_dev):
        pcfg = self.cfg["pointcloud"]
        if not self.dyn:
            shape = (self.ms.h, self.ms.w)
            return (jnp.full(shape, pcfg["radius_add"], jnp.float32),
                    jnp.full(shape, pcfg["radius_query"], jnp.float32),
                    None, None)
        r_add, r_query, cand_idx, cand_ok = prepare_frame(
            color_dev, pcfg["radius_add_max"], pcfg["radius_add_min"],
            pcfg["radius_query_ratio"], pcfg["color_grad_threshold"],
            self.ms.grad_top)
        return r_add, r_query, cand_idx, cand_ok

    def dispatch_overlap_scores(self, cur_c2w, gt_color, gt_depth):
        """Launch the overlap-score computation WITHOUT syncing, so its
        device compute and fetch RTT overlap the densification tail
        (map_frame dispatches this before the densify-counter fetch).
        Returns the device scores array, or None when selection does not
        use overlap scores (empty store / refine / global method) — key
        and numpy-rng draw order match select_keyframes exactly."""
        mp = self.cfg["mapping"]
        n_kf = len(self.keyframe_list)
        if (n_kf == 0 or self.refine_mode
                or mp["keyframe_selection_method"] != "overlap"):
            return None
        return overlap_scores(
            self.ms, self.store.est_c2w_padded(), jnp.asarray(n_kf - 1),
            cur_c2w, gt_color, gt_depth, self._next_key())

    def select_keyframes(self, cur_c2w, gt_color, gt_depth, scores_dev=None):
        """Window of keyframe ring slots for this frame (reference semantics:
        overlap-or-global choice of window-2, plus the latest keyframe; the
        current frame rides separately as the last slot). ``scores_dev``:
        pre-dispatched dispatch_overlap_scores result for this frame."""
        mp = self.cfg["mapping"]
        num = self.window - 2
        n_kf = len(self.keyframe_list)
        if n_kf == 0:
            return []
        if self.refine_mode:
            num = 2 * self.window - 2
            sel = list(self.rng.permutation(max(n_kf - 1, 0))[:num])
        elif mp["keyframe_selection_method"] == "global":
            sel = list(self.rng.permutation(max(n_kf - 1, 0))[:num])
        else:
            if scores_dev is None:
                scores_dev = self.dispatch_overlap_scores(
                    cur_c2w, gt_color, gt_depth)
            scores = np.asarray(scores_dev)
            qualifying = [k for k in range(n_kf - 1) if scores[k] > 0.0]
            sel = list(self.rng.permutation(qualifying)[:num])
        sel = [int(s) for s in sel] + [n_kf - 1]
        return sel

    # -- the per-frame entry ---------------------------------------------

    def map_frame(self, idx: int, gt_color: np.ndarray, gt_depth: np.ndarray,
                  gt_c2w: np.ndarray, cur_c2w: np.ndarray,
                  color_refine: bool = False,
                  radius=None) -> Dict[str, float]:
        """``radius``: optional precomputed radius_maps(color) tuple — the
        orchestrator computes it once per frame for the tracker and passes
        it here to avoid recomputing the Sobel/radius/candidate maps."""
        cfg = self.cfg
        mp = cfg["mapping"]
        init = idx == 0
        self.refine_mode = color_refine

        # optional: freeze the geometry decoder once it has trained for N
        # frames — approximates the reference's frozen-PRETRAINED decoder
        # configuration (src/Point_SLAM.py:143-164) when no pretrained
        # weights exist; A/B'd in profiling/geo_decoder_ab.py
        fga = mp.get("fix_geo_decoder_after") or 0
        if fga and not self.ms.fix_geo_decoder and idx >= fga:
            self.ms = self.ms._replace(fix_geo_decoder=True)

        color_dev = jnp.asarray(gt_color)
        depth_dev = jnp.asarray(gt_depth)
        cur_c2w_dev = jnp.asarray(cur_c2w)
        r_add, r_query, cand_idx, cand_ok = (
            radius if radius is not None else self.radius_maps(color_dev))
        if cand_ok is not None:
            # candidate pool additionally requires valid depth (common.py:147-153)
            dvals = depth_dev.reshape(-1)[cand_idx]
            cand_ok = cand_ok & (dvals > 0)

        # ---- densification
        n_acc_total = 0
        if not color_refine:
            if init:
                med = float(np.median(gt_depth[gt_depth > 0])) if \
                    (gt_depth > 0).any() else 2.5
                add_n = int(np.clip(mp["pixels_adding"] * (med / 2.5) ** 2,
                                    mp["pixels_adding"], mp["pixels_adding"] * 3))
            else:
                add_n = mp["pixels_adding"]
            self._ensure_capacity(
                (self.ms.add_max + self.ms.grad_max) * self.ms.n_add)
            # insert_index hard precondition (n_old + m <= capacity): the
            # worst case over BOTH densify batches is exactly the bound
            # _ensure_capacity just guaranteed
            assert (self.n_points_host
                    + (self.ms.add_max + self.ms.grad_max) * self.ms.n_add
                    <= self.cloud.pos.shape[0])

            o, d, dep, col, ra, valid = sample_add_rays(
                self.ms, self._next_key(), cur_c2w_dev, color_dev, depth_dev,
                r_add, jnp.asarray(add_n))
            n_before = self.cloud.n_points
            self.cloud, n1 = pc.add_points(
                self.cloud, self.index, o, d, dep, col, valid, ra,
                self._next_key(), self.ms.near_end_surface_pc,
                self.ms.far_end_surface_pc, n_add=self.ms.n_add,
                fix_interval=cfg["pointcloud"]["fix_interval_when_add_along_ray"])
            # incremental table insert (bit-identical to a rebuild; O(batch)
            # instead of the rebuild's O(CAP log CAP) argsort — 27 vs 58 ms
            # at CAP=2^19, and the gap grows as capacity doubles)
            self.index = pc.insert_index(self.cloud, self.index, n_before,
                                         m=self.ms.add_max * self.ms.n_add)
            n2 = jnp.zeros((), jnp.int32)

            if mp["pixels_based_on_color_grad"] > 0 and cand_idx is not None:
                o, d, dep, col, ra, valid = sample_grad_rays(
                    self.ms, self._next_key(), cur_c2w_dev, color_dev,
                    depth_dev, r_add, cand_idx, cand_ok)
                n_before = self.cloud.n_points
                self.cloud, n2 = pc.add_points(
                    self.cloud, self.index, o, d, dep, col, valid, ra,
                    self._next_key(), self.ms.near_end_surface_pc,
                    self.ms.far_end_surface_pc, n_add=self.ms.n_add,
                    fix_interval=cfg["pointcloud"][
                        "fix_interval_when_add_along_ray"])
                self.index = pc.insert_index(
                    self.cloud, self.index, n_before,
                    m=self.ms.grad_max * self.ms.n_add)
            # densification counters: stacked on device here, fetched only
            # AFTER the frustum mask and overlap scores are dispatched so
            # the fetch's tunnel RTT overlaps their device compute instead
            # of serializing in front of it
            nvals_dev = jnp.stack([n1, n2, self.cloud.n_points])

        # ---- frustum feature selection (gradient mask,
        # src/Mapper.py:120-168,342-356; kept full-buffer — see the
        # map_optimize docstring for the measured compaction trade-off)
        cap = self.cloud.pos.shape[0]
        if mp["frustum_feature_selection"] and not color_refine:
            frustum = pc.frustum_mask(
                self.cloud.pos, self.cloud.n_points,
                jnp.linalg.inv(cur_c2w_dev), depth_dev,
                self.ms.fx, self.ms.fy, self.ms.cx, self.ms.cy,
                self.ms.frustum_edge)
        else:
            frustum = jnp.arange(cap) < self.cloud.n_points

        # ---- window-selection overlap scores (dispatch, no sync; key draw
        # order matches the old in-select draw: first key after densify)
        scores_dev = self.dispatch_overlap_scores(cur_c2w_dev, color_dev,
                                                  depth_dev)

        if not color_refine:
            if scores_dev is not None:
                # ONE host fetch for counters + overlap scores (each
                # np.asarray sync is a tunnel round-trip; the counts are
                # exact in f32 — point_capacity_max 2^22 << 2^24)
                fused = np.asarray(jnp.concatenate(
                    [nvals_dev.astype(jnp.float32), scores_dev]))
                nvals, scores_dev = fused[:3], fused[3:]
            else:
                nvals = np.asarray(nvals_dev)
            n_acc_total = int(nvals[0] + nvals[1])
            self.n_points_host = int(nvals[2])

        # ---- iteration budget (src/Mapper.py:404-406,713-726)
        if init:
            n_iters = mp["iters_first"]
            geo_bound = mp["geo_iter_first"]
        else:
            n_iters = mp["iters"]
            if color_refine:
                n_iters *= 2
                geo_bound = 0  # geo_iter_ratio 0.0: only iteration 0 is geometry
            else:
                n_iters = int(np.clip(int(n_iters * n_acc_total / 300),
                                      int(mp["min_iter_ratio"] * n_iters),
                                      2 * n_iters))
                geo_bound = int(n_iters * mp["geo_iter_ratio"])

        # ---- LR schedule (traced triples)
        cur_stage = "init" if init else "stage"
        sched = mp[cur_stage]
        lr_geo = jnp.asarray([sched["geometry"]["decoders_lr"],
                              sched["geometry"]["geometry_lr"],
                              sched["geometry"]["color_lr"]], jnp.float32)
        if color_refine:
            lr_col = jnp.asarray([sched["color"]["decoders_lr"], 0.0,
                                  sched["color"]["color_lr"] / 10.0], jnp.float32)
            fix_color = jnp.asarray(0.0)   # fix_color_decoder=True in refine
        else:
            lr_col = jnp.asarray([sched["color"]["decoders_lr"],
                                  sched["color"]["geometry_lr"],
                                  sched["color"]["color_lr"]], jnp.float32)
            fix_color = jnp.asarray(0.0 if mp["fix_color_decoder"] else 1.0)

        # ---- optimize; color refinement reruns the window 5x
        # (src/Mapper.py:713-736 outer_joint_iters)
        outer_iters = 5 if color_refine else 1
        stats = np.zeros(3)
        for outer in range(outer_iters):
            sel = self.select_keyframes(
                cur_c2w_dev, color_dev, depth_dev,
                scores_dev=scores_dev if outer == 0 else None)
            n_frames = len(sel) + 1
            if mp["save_selected_keyframes_info"] and outer == 0:
                self.selected_keyframes[idx] = [
                    {"idx": self.keyframe_list[s]} for s in sel] + [{"idx": idx}]

            f = self.ms.f_max
            w_color, w_depth, w_rq, w_c2w, w_exp = \
                self.store.gather_window(sel, f)
            w_color = w_color.at[len(sel)].set(color_dev)
            w_depth = w_depth.at[len(sel)].set(depth_dev)
            w_rq = w_rq.at[len(sel)].set(r_query)
            w_c2w = w_c2w.at[len(sel)].set(cur_c2w_dev)
            w_exp = w_exp.at[len(sel)].set(jnp.asarray(self.exposure_feat))
            pixs_per_image = self.ms.r_max // n_frames

            # ---- bundle adjustment (src/Mapper.py:375-397,727-737): with
            # >4 keyframes, window cameras become quat+trans leaves; the
            # oldest keyframe stays fixed to anchor the map
            ba_on = bool(mp["BA"]) and len(self.keyframe_list) > 4
            if ba_on != self.ms.ba:
                self.ms = self.ms._replace(ba=ba_on)
            ba_kwargs = {}
            if ba_on:
                poses_host = np.asarray(w_c2w[:n_frames])
                # padding slots carry IDENTITY quaternions: a zero quaternion
                # gives a NaN pose (2/|q|^2), and even loss-masked rays from a
                # NaN pose poison every gradient through backprop (0*NaN=NaN)
                pad_cam = np.array([1, 0, 0, 0, 0, 0, 0], np.float32)
                cams_np = np.stack(
                    [camera.tensor_from_pose_matrix(p) for p in poses_host]
                    + [pad_cam] * (f - n_frames))
                mask = np.zeros((f,), np.float32)
                mask[:n_frames] = 1.0
                mask[int(np.argmin([self.keyframe_list[s] for s in sel]))] = 0.0
                ba_kwargs = dict(
                    cams0=jnp.asarray(cams_np, jnp.float32),
                    ba_mask=jnp.asarray(mask),
                    lr_ba=jnp.asarray(mp["BA_cam_lr"], jnp.float32),
                    ba_lo=jnp.asarray(
                        int(n_iters * (mp["geo_iter_ratio"] + 0.2))),
                    ba_hi=jnp.asarray(
                        int(n_iters * (mp["geo_iter_ratio"] + 0.3))))

            # chunked launches: a single device program must stay well under
            # the runtime watchdog (~1 min); iteration semantics are unchanged
            chunk = max(int(self.cfg["tpu"].get("max_iters_per_launch", 200)), 1)
            it = 0
            opt_state = None
            key = self._next_key()
            params = self.params
            packed = self.cloud.packed
            w_exp_out = w_exp
            stats_dev = jnp.zeros(3)
            cams_out = None
            while it < n_iters:
                n_end = min(it + chunk, n_iters)
                (params, packed, w_exp_out, stats_dev,
                 opt_state, key, cams_out) = map_optimize(
                    self.ms, self.rc, params, packed,
                    self.cloud.n_points,
                    self.index, w_color, w_depth, w_rq, w_c2w, w_exp_out,
                    jnp.asarray(n_frames), jnp.asarray(pixs_per_image),
                    jnp.asarray(len(sel)), frustum, lr_geo, lr_col,
                    jnp.asarray(0.001), fix_color, jnp.asarray(geo_bound),
                    jnp.asarray(n_end), key,
                    it0=jnp.asarray(it, jnp.int32), opt_in=opt_state,
                    **ba_kwargs)
                if ba_on:
                    ba_kwargs["cams0"] = cams_out
                it_prev, it = it, n_end
                if self.vis_hook is not None and it < n_iters:
                    # publish the in-progress state so the visualizer
                    # renders the current map, then fire between launches
                    self.params = params
                    self.cloud = self.cloud._replace(packed=packed)
                    self.vis_hook(idx, it_prev, it, n_iters, cur_c2w_dev)
                if self.cfg["verbose"]:
                    s = np.asarray(stats_dev)
                    print(f"    [map chunk] it {it}/{n_iters} "
                          f"geo {s[0]:.3f} col {s[1]:.3f} n {s[2]:.0f}",
                          flush=True)
            self.params = params

            self.cloud = self.cloud._replace(packed=packed)
            if self.ms.encode_exposure:
                self.exposure_feat = np.asarray(w_exp_out[len(sel)])
            stats = np.asarray(stats_dev)

            if ba_on and cams_out is not None:
                # write optimized keyframe poses back to the keyframe store
                # and adopt the refined current pose (src/Mapper.py:615-637)
                cams_host = np.asarray(cams_out[:n_frames])
                new_poses = [camera.pose_matrix_from_tensor_np(c)
                             for c in cams_host]
                for k, s in enumerate(sel):
                    self.store.set_est_c2w(s, new_poses[k])
                cur_c2w = new_poses[len(sel)]
                cur_c2w_dev = jnp.asarray(cur_c2w)
        if self.ms.encode_exposure:
            self.exposure_feat_all.append(self.exposure_feat.copy())
            # snapshot the color decoder per mapped frame: the end-of-run
            # re-render must pair each frame's exposure feature with the
            # decoder epoch it was trained against (src/Mapper.py:631-635,
            # re-loaded at src/Mapper.py:826-846)
            self.color_decoder_snapshots.append(
                jax.tree.map(np.asarray, self.params["col"]))

        # ---- keyframe bookkeeping (src/Mapper.py:741-751)
        if ((idx % mp["keyframe_every"] == 0 or idx == self.n_img - 2)
                and idx not in self.keyframe_list
                and np.isfinite(gt_c2w).all()):
            self.store.append(color_dev, depth_dev, cur_c2w,
                              gt_c2w, self.exposure_feat)
            self.keyframe_list.append(idx)

        out = {"geo_loss": float(stats[0]), "color_loss": float(stats[1]),
               "n_mask": float(stats[2]), "n_added": n_acc_total,
               "n_iters": n_iters, "n_points": self.n_points_host,
               "cur_c2w": np.asarray(cur_c2w, np.float32)}
        self.frame_stats[idx] = out
        return out
