"""Depth-guided volumetric renderer, fused for XLA.

One traceable function turns a ray batch into depth/uncertainty/color:
z-value placement around sensor depth, a single kNN over all ray samples
(shared by both decoders — the reference queried FAISS once per decoder with
identical points, src/conv_onet/models/decoder.py:136,347), feature
interpolation, geometry+color MLPs, invalid-sample occupancy masking, and
normalized alpha compositing. Behavior parity: src/utils/Renderer.py:77-202.

Static shapes: rays carry a validity mask instead of being filtered; all
downstream losses are masked sums, so results are exact.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from point_slam_tpu.common.compositing import raw2outputs
from point_slam_tpu.common.image import masked_max, masked_mean
from point_slam_tpu.models import decoders as D
from point_slam_tpu.ops import knn
from point_slam_tpu import pointcloud as pc


class RenderConfig(NamedTuple):
    """Static (hashable) rendering configuration."""
    n_surface: int = 5
    near_end: float = 0.3
    near_end_surface: float = 0.98
    far_end_surface: float = 1.02
    sample_near_pcl: bool = False
    sigmoid_coef: float = 0.1
    weighting: str = "distance"
    min_nn_num: int = 2
    nn_num: int = 8
    encode_rel_pos_in_col: bool = True
    use_view_direction: bool = False
    encode_exposure: bool = False
    points_batch: int = 500_000
    ray_batch: int = 3000
    # ray-shared Pallas kNN (ops/knn.ray_grid_knn): ~2x mapping-scale kNN.
    # "auto" resolves to True on TPU, False on CPU (interpret-mode Pallas
    # is only for tests).
    ray_knn: bool = False
    # per-ray probe-slot budget for ray_grid_knn (tpu.knn_probes); a
    # compiled kernel shape, so it lives in the static config
    knn_probes: int = 36
    # matmul precision for the decoder MLP blocks ONLY (tpu.mlp_precision):
    # None inherits the global default ('highest' — six f32 MXU passes);
    # 'default' runs them as one bf16-input/f32-accumulate pass. Fourier
    # embeddings always stay at the global precision (high-frequency phase
    # projections are rounding-sensitive).
    mlp_precision: Optional[str] = None


def _resolve_ray_knn(cfg: Dict[str, Any]) -> bool:
    mode = cfg.get("tpu", {}).get("ray_knn", "auto")
    if mode == "auto":
        return jax.default_backend() not in ("cpu",)
    return bool(mode)


def make_render_config(cfg: Dict[str, Any], sigmoid_coef: float) -> RenderConfig:
    mlp_prec = cfg.get("tpu", {}).get("mlp_precision", None)
    if mlp_prec in ("", "global", "highest"):
        mlp_prec = None  # 'highest' IS the pinned global default
    return RenderConfig(
        ray_knn=_resolve_ray_knn(cfg),
        mlp_precision=mlp_prec,
        knn_probes=int(cfg.get("tpu", {}).get("knn_probes", 0))
        or knn._P_RAY_DEFAULT,
        n_surface=cfg["rendering"]["N_surface"],
        near_end=cfg["rendering"]["near_end"],
        near_end_surface=cfg["rendering"]["near_end_surface"],
        far_end_surface=cfg["rendering"]["far_end_surface"],
        sample_near_pcl=cfg["rendering"]["sample_near_pcl"],
        sigmoid_coef=sigmoid_coef,
        weighting=cfg["pointcloud"]["nn_weighting"],
        min_nn_num=cfg["pointcloud"]["min_nn_num"],
        nn_num=cfg["pointcloud"]["nn_num"],
        encode_rel_pos_in_col=cfg["model"]["encode_rel_pos_in_col"],
        use_view_direction=cfg["model"]["use_view_direction"],
        encode_exposure=cfg["model"]["encode_exposure"],
    )


def build_z_vals(rc: RenderConfig, index: knn.GridIndex,
                 rays_o, rays_d, gt_depth, r_query, ray_valid):
    """Per-ray sample depths + near-cloud mask for depth-free rays.

    Parity: src/utils/Renderer.py:108-170. ``far`` uses the masked batch
    statistics (the reference computes them on the filtered batch).
    """
    ns = rc.n_surface
    depth_pos = ray_valid & (gt_depth > 0)
    far = jnp.minimum(5.0 * masked_mean(gt_depth, depth_pos),
                      1.2 * masked_max(gt_depth, depth_pos))

    t = jnp.linspace(0.0, 1.0, ns)
    z_surface = (rc.near_end_surface * gt_depth[:, None] * (1 - t)[None, :]
                 + rc.far_end_surface * gt_depth[:, None] * t[None, :])

    near_pcl_ok = jnp.ones_like(gt_depth, dtype=bool)
    if rc.sample_near_pcl:
        z_zero, invalid_near = pc.sample_near_pcl(
            index,
            jax.lax.stop_gradient(rays_o), jax.lax.stop_gradient(rays_d),
            rc.near_end, far, r_query, num=ns)
        near_pcl_ok = jnp.where(gt_depth > 0, True, ~invalid_near)
    else:
        # uniform near_end -> far (traced endpoint): interpolate manually
        z_zero = rc.near_end * (1 - t)[None, :] + far * t[None, :]
        z_zero = jnp.broadcast_to(z_zero, (gt_depth.shape[0], ns))

    z_vals = jnp.where((gt_depth > 0)[:, None], z_surface, z_zero)
    return z_vals, near_pcl_ok


def _knn_core(index, pts, rc: RenderConfig):
    """kNN over the (R, ns, 3) sample grid: Pallas ray-shared top-8 with the
    per-sample fallback sweep (ray_knn), or per-sample grid_knn. Returns
    (dists, idx, valid) flattened to (R*ns, K); ray_knn dists are zeros —
    the caller recomputes exact distances from winner coordinates."""
    if rc.ray_knn:
        _, idx, valid, compact = knn.ray_grid_knn(
            index, jax.lax.stop_gradient(pts), k=rc.nn_num,
            probes=rc.knn_probes)
        # Rays whose samples spread beyond the probed box (uniform sampling
        # of depth-free rays; long-depth rays whose 0.98d-1.02d span exceeds
        # the 4-cell box) would keep truncated neighbor sets; route those
        # (rare) non-compact rays through per-sample grid_knn. The fallback
        # is grid_knn_subset — a chunked sweep over ONLY the non-compact
        # rays, so its cost tracks the actual fallback workload instead of
        # the full batch (a full-batch parked-query pass costs ~5 ms/iter at
        # mapping scale because grid_knn's cost is set by its static query
        # count, and realistic depth maps make some ray non-compact almost
        # every iteration). The outer lax.cond still skips even the subset
        # sweep when every ray is compact.
        def _fallback(_):
            i_f, v_f = knn.grid_knn_subset(
                index, jax.lax.stop_gradient(pts), ~compact, k=rc.nn_num)
            rep = jnp.repeat(compact, pts.shape[1])[:, None]
            return (jnp.where(rep, idx, i_f.reshape(-1, rc.nn_num)),
                    jnp.where(rep, valid, v_f.reshape(-1, rc.nn_num)))

        idx, valid = jax.lax.cond(
            jnp.any(~compact), _fallback, lambda _: (idx, valid),
            operand=None)
        return jnp.zeros(valid.shape, jnp.float32), idx, valid
    p = pts.reshape(-1, 3)
    return knn.grid_knn(index, jax.lax.stop_gradient(p), k=rc.nn_num)


def _knn_query(index, pts, rc: RenderConfig):
    """_knn_core, dispatched per-device when a dp mesh is active.

    Both kNN backends are opaque to the GSPMD partitioner — the Pallas
    kernel lowers to a mosaic custom-call, and per-sample grid_knn's
    lax.top_k lowers to the TopK custom-call — so under plain jit at dp=8
    the partitioner ALL-GATHERS the (R*ns, probes*C) candidate-distance
    block to every device and runs TopK replicated (measured: 2 x 70.8 MB
    all-gathers per iteration at toy scale, profiling/dp_scaling.py /
    output/dp_scaling.json — vs a 9.4 MB packed buffer). shard_map pins
    the query to the local ray shard with the index tables replicated;
    results are bit-exact vs the unsharded path (per-sample computation,
    rays padded to a dp multiple with far-away dummies and sliced back)."""
    from point_slam_tpu.parallel import mesh as pmesh
    mesh = pmesh.get_mesh()
    if mesh is None or mesh.shape.get("dp", 1) <= 1:
        return _knn_core(index, pts, rc)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    dp = mesh.shape["dp"]
    r, ns = pts.shape[0], pts.shape[1]
    rpad = (-r) % dp
    pts_in = pts if rpad == 0 else jnp.concatenate(
        [pts, jnp.full((rpad, ns, 3), 1e7, pts.dtype)], axis=0)
    fn = shard_map(
        functools.partial(_knn_core, rc=rc), mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(), index), P("dp")),
        out_specs=P("dp"), check_vma=False)
    dists, idx, valid = fn(index, pts_in)
    if rpad:
        n = r * ns
        dists, idx, valid = dists[:n], idx[:n], valid[:n]
    return dists, idx, valid


def render_rays(params: Dict[str, Any], packed, n_points,
                index: knn.GridIndex,
                rays_o, rays_d, gt_depth, r_query, ray_valid,
                key, rc: RenderConfig, stage_color: bool,
                is_tracker: bool = False, exposure_feat=None,
                apply_sigmoid_color: bool = True):
    """Render a ray batch.

    ``packed`` is the cloud's (CAP, 72) geo|col|pos array (pointcloud.PACK_W
    layout): all per-neighbor state comes from ONE row gather — TPU gathers
    are row-count bound, so one 72-wide fetch beats three narrow ones ~2x.

    Returns (depth (R,), uncertainty (R,), color (R,3), valid_ray_mask (R,)).
    When ``is_tracker``, neighbor distances are recomputed differentiably from
    the gathered neighbor coordinates so pose gradients flow
    (decoder.py:143-148); kNN indices themselves are stop-gradiented.
    """
    r = rays_o.shape[0]
    ns = rc.n_surface
    c_dim = pc.C_DIM

    z_vals, near_pcl_ok = build_z_vals(rc, index, rays_o, rays_d,
                                       gt_depth, r_query, ray_valid)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    p = pts.reshape(-1, 3)                                   # (R*ns, 3)
    r_query_pts = jnp.repeat(r_query, ns)

    dists, idx, valid = _knn_query(index, pts, rc)
    nb = packed[idx]                                         # (N,K,PACK_W)
    neigh_pos = jax.lax.stop_gradient(pc.neighbor_pos(nb))
    if rc.ray_knn or is_tracker:
        # ray_knn: exact distances from winner coordinates (ray_grid_knn's
        # are selection-quantized); identical float ops to grid_knn's d2.
        # is_tracker: recomputed differentiably so pose gradients flow.
        p_q = p if is_tracker else jax.lax.stop_gradient(p)
        diff = neigh_pos - p_q[:, None, :]
        dists = jnp.sum(diff * diff, axis=-1)
    counts = knn.neighbor_count(dists, valid, r_query_pts)
    has_neighbors = counts > rc.min_nn_num - 1

    w = D.interpolation_weights(dists, valid, r_query_pts, rc.weighting)

    kg, kc = jax.random.split(key)
    c_geo = jnp.sum(w[..., None] * pc.neighbor_geo(nb), axis=1)
    c_geo = D.random_fill_features(kg, c_geo, has_neighbors, c_dim)
    occ = D.geo_decoder_apply(params["geo"], p, c_geo,
                              precision=rc.mlp_precision)

    valid_ray = jnp.sum(has_neighbors.reshape(r, ns), axis=1) >= (ns // 2 + 1)
    valid_ray = valid_ray & near_pcl_ok

    if stage_color:
        neigh_feats = pc.neighbor_col(nb)                    # (N,K,c)
        if rc.encode_rel_pos_in_col:
            neigh_feats = D.encode_neighbor_feats(params["col"], neigh_pos, p,
                                                  neigh_feats,
                                                  precision=rc.mlp_precision)
        c_col = jnp.sum(w[..., None] * neigh_feats, axis=1)
        c_col = D.random_fill_features(kc, c_col, has_neighbors, c_dim)
        views_d = None
        if rc.use_view_direction:
            views_d = jnp.repeat(rays_d, ns, axis=0)
        if rc.encode_exposure and exposure_feat is not None:
            rgb = D.col_decoder_apply(params["col"], p, c_col, views_d,
                                      exposure_feat=exposure_feat,
                                      precision=rc.mlp_precision)
        else:
            sig = apply_sigmoid_color and not rc.encode_exposure
            rgb = D.col_decoder_apply(params["col"], p, c_col, views_d,
                                      apply_sigmoid=sig,
                                      precision=rc.mlp_precision)
    else:
        rgb = jnp.zeros((p.shape[0], 3), jnp.float32)

    occ = jnp.where(has_neighbors, occ, -100.0)              # Renderer.py:189-190
    raw = jnp.concatenate([rgb, occ[:, None]], axis=-1).reshape(r, ns, 4)
    depth, uncertainty, color, _ = raw2outputs(raw, z_vals, rays_d,
                                               coef=rc.sigmoid_coef)
    if not rc.sample_near_pcl:
        depth = jnp.where(gt_depth > 0, depth, 0.0)          # Renderer.py:200-201
    return depth, uncertainty, color, valid_ray


@functools.partial(jax.jit, static_argnames=("rc", "stage_color", "h", "w"))
def _render_chunk(params, packed, n_points, index,
                  rays_o, rays_d, gt_depth, r_query, ray_valid, key, rc,
                  stage_color, h=0, w=0, exposure_feat=None):
    return render_rays(params, packed, n_points,
                       index, rays_o, rays_d, gt_depth, r_query, ray_valid,
                       key, rc, stage_color, is_tracker=False,
                       exposure_feat=exposure_feat)


def render_img(params, cloud: pc.CloudState, index, c2w, intrinsics,
               hw, rc: RenderConfig, key, gt_depth=None, r_query=None,
               stage_color: bool = True, exposure_feat=None):
    """Full-image render in fixed-size ray chunks (src/utils/Renderer.py:204-283).

    Returns (depth (H,W), uncertainty (H,W), color (H,W,3)) device arrays.
    """
    from point_slam_tpu.common.camera import rays_full_image
    h, w = hw
    fx, fy, cx, cy = intrinsics
    rays_o, rays_d = rays_full_image(h, w, fx, fy, cx, cy, c2w)
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    n = h * w
    gt = (jnp.zeros(n, jnp.float32) if gt_depth is None
          else gt_depth.reshape(-1).astype(jnp.float32))
    rq = (jnp.full(n, 1e6, jnp.float32) if r_query is None
          else r_query.reshape(-1).astype(jnp.float32))

    bs = rc.ray_batch
    pad = (-n) % bs
    def padded(x, fill=0.0):
        return jnp.concatenate([x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)])
    rays_o_p, rays_d_p = padded(rays_o), padded(rays_d)
    gt_p, rq_p = padded(gt), padded(rq, 1e6)
    valid_p = padded(jnp.ones(n, bool), False)

    outs_d, outs_u, outs_c = [], [], []
    for i in range(0, n + pad, bs):
        sl = slice(i, i + bs)
        dep, unc, col, _ = _render_chunk(
            params, cloud.packed,
            cloud.n_points, index, rays_o_p[sl], rays_d_p[sl], gt_p[sl],
            rq_p[sl], valid_p[sl], jax.random.fold_in(key, i), rc,
            stage_color, exposure_feat=exposure_feat)
        outs_d.append(dep)
        outs_u.append(unc)
        outs_c.append(col)
    depth = jnp.concatenate(outs_d)[:n].reshape(h, w)
    uncertainty = jnp.concatenate(outs_u)[:n].reshape(h, w)
    color = jnp.concatenate(outs_c)[:n].reshape(h, w, 3)
    return depth, uncertainty, color
