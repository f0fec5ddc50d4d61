"""End-of-run evaluation pipeline (in-process).

Mirrors the reference's post-SLAM driver (src/Mapper.py:793-931): trajectory
ATE (aligned + unaligned), re-rendering of every mapped frame with
PSNR / MS-SSIM / (optional) LPIPS and rendered-depth L1, saved renders for
TSDF meshing, then mesh extraction + reconstruction eval. No subprocess /
printed-dict IPC — everything is a function call returning dicts.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from point_slam_tpu import renderer as R
from point_slam_tpu.tools.eval_ate import evaluate_ate
from point_slam_tpu.utils import metrics


def eval_reconstruction(slam, cfg, mesh_path: str, out_dir: str
                        ) -> Dict[str, float]:
    """3D reconstruction eval vs a GT mesh (src/tools/eval_recon parity).

    GT mesh sources, in order: `meshing.gt_mesh` (a ply path, as the
    reference's eval_recon CLI takes), else the dataset's analytic
    `gt_mesh()` (Synthetic). The GT is culled to the estimated trajectory's
    frusta (the reference's cull_mesh step) before the tau=1cm F-score.
    Returns {} when no GT surface is available.
    """
    from point_slam_tpu.tools.cull_mesh import cull_mesh
    from point_slam_tpu.tools.eval_recon import calc_3d_metric
    from point_slam_tpu.utils.ply import write_ply

    gt_path = cfg.get("meshing", {}).get("gt_mesh") or None
    if gt_path is None and hasattr(slam.dataset, "gt_mesh"):
        v, f = slam.dataset.gt_mesh()
        cam = cfg["cam"]
        n = slam.n_img
        cv, cf, _ = cull_mesh(v, f, slam.estimate_c2w_list[:n],
                              H=cam["H"], W=cam["W"], fx=cam["fx"],
                              fy=cam["fy"], cx=cam["cx"], cy=cam["cy"])
        gt_path = os.path.join(out_dir, "mesh", "gt_culled.ply")
        write_ply(gt_path, cv, faces=cf)
    if gt_path is None or not os.path.exists(gt_path):
        return {}
    res = calc_3d_metric(mesh_path, gt_path, threshold=0.01)
    out = {f"recon_{k.replace(' ', '_').replace('-', '_')}": v
           for k, v in res.items()}
    if cfg.get("meshing", {}).get("eval_2d", False):
        # virtual-view depth-L1 (src/tools/eval_recon.py:86-171); works
        # against any GT mesh — the *_pc_unseen.npy rejection file is
        # optional (only the reference's Replica bundle ships one)
        from point_slam_tpu.tools.eval_recon import calc_2d_metric
        res2d = calc_2d_metric(
            mesh_path, gt_path,
            n_imgs=int(cfg["meshing"].get("eval_2d_n_imgs", 1000)))
        out["recon_depth_l1_2d"] = res2d["depth l1"]
    return out


def rerender_frames(slam, out_dir: str, save_renders: bool = True,
                    eval_img: Optional[bool] = None,
                    stride: int = 1) -> Dict[str, Any]:
    """Re-render every mapped frame from the final map (src/Mapper.py:816-899).

    Returns averaged metrics; saves depth/color npy pairs for TSDF fusion.
    `stride` > 1 evaluates every stride-th mapped frame instead of all of
    them (used by the at-scale soak eval to bound device time at 1000+
    mapped frames); the reported metrics note the subsample via frame_cnt.
    """
    cfg = slam.cfg
    mapper = slam.mapper
    every = cfg["mapping"]["every_frame"]
    step = every * max(int(stride), 1)
    if eval_img is None:
        eval_img = cfg["rendering"]["eval_img"]
    rend_dir = os.path.join(out_dir, "rendered_every_frame")
    img_dir = os.path.join(out_dir, "rendered_image")
    os.makedirs(rend_dir, exist_ok=True)
    os.makedirs(img_dir, exist_ok=True)

    cam = cfg["cam"]
    intr = (cam["fx"], cam["fy"], cam["cx"], cam["cy"])
    hw = (cam["H"], cam["W"])
    rc = mapper.rc

    psnr_sum = ssim_sum = lpips_sum = depth_l1 = 0.0
    lpips_n = 0
    frame_cnt = 0
    n = len(slam.estimate_c2w_list)
    key = jax.random.key(0)
    for idx in range(0, n, step):
        _, gt_color, gt_depth, _ = slam.dataset[idx]
        c2w = jnp.asarray(slam.estimate_c2w_list[idx])
        _, r_query, _, _ = mapper.radius_maps(jnp.asarray(gt_color))
        params = mapper.params
        snaps = getattr(mapper, "color_decoder_snapshots", None)
        if snaps and idx // every < len(snaps):
            # exposure runs pair each frame with the color-decoder epoch it
            # was optimized against (src/Mapper.py:826-846)
            params = {**params, "col": jax.tree.map(jnp.asarray,
                                                    snaps[idx // every])}
        dep, unc, col = R.render_img(
            params, mapper.cloud, mapper.index, c2w, intr, hw, rc,
            jax.random.fold_in(key, idx), jnp.asarray(gt_depth), r_query,
            exposure_feat=(jnp.asarray(mapper.exposure_feat_all[idx // every])
                           if mapper.exposure_feat_all else None))
        dep = np.asarray(dep)
        col = np.asarray(col)
        if save_renders:
            np.save(os.path.join(rend_dir, f"depth_{idx:05d}"), dep)
            np.save(os.path.join(rend_dir, f"color_{idx:05d}"), col)
        mask = gt_depth > 0
        if mask.any():
            depth_l1 += float(np.abs(gt_depth[mask] - dep[mask]).mean())
        if eval_img:
            psnr_sum += metrics.psnr(jnp.asarray(col), jnp.asarray(gt_color),
                                     jnp.asarray(mask))
            ssim_sum += metrics.ms_ssim(jnp.asarray(col), jnp.asarray(gt_color))
            lp = metrics.lpips(col, gt_color)
            if lp is not None:
                lpips_sum += lp
                lpips_n += 1
        frame_cnt += 1
        if slam.cfg.get("verbose") and frame_cnt % 25 == 0:
            print(f"  [rerender] {frame_cnt} frames (idx {idx})", flush=True)

    out: Dict[str, Any] = {"frame_cnt": frame_cnt,
                           "depth_l1_render": depth_l1 / max(frame_cnt, 1)}
    if eval_img:
        out["avg_psnr"] = psnr_sum / max(frame_cnt, 1)
        out["avg_ms_ssim"] = ssim_sum / max(frame_cnt, 1)
        # an explicit reason instead of a silent None when the metric could
        # not run (no AlexNet weights in a zero-egress image)
        out["avg_lpips"] = ((lpips_sum / lpips_n) if lpips_n
                            else metrics.LPIPS_UNAVAILABLE)
    return out


def run_end_of_run_eval(slam, out_dir: str) -> Dict[str, Any]:
    cfg = slam.cfg
    results: Dict[str, Any] = {}
    ate_ok = False

    try:
        ate = evaluate_ate(slam.gt_c2w_list, slam.estimate_c2w_list, align=True)
        ate_no = evaluate_ate(slam.gt_c2w_list, slam.estimate_c2w_list,
                              align=False)
        results["ate_rmse"] = ate["absolute_translational_error.rmse"]
        results["ate_rmse_no_align"] = ate_no[
            "absolute_translational_error.rmse"]
        print("ate_rmse:", ate)
        print("ate_rmse_wo_align:", ate_no)
        from point_slam_tpu.tools.eval_ate import plot_traj
        plot_traj(slam.gt_c2w_list, slam.estimate_c2w_list,
                  os.path.join(out_dir, "trajectory.png"))
        ate_ok = True
    except Exception as e:  # pragma: no cover
        print("ATE evaluation failed:", e)

    if cfg["dataset"] in cfg.get("render_datasets", []):
        try:
            rr = rerender_frames(slam, out_dir)
            results.update(rr)
            print({k: v for k, v in rr.items()})
        except Exception as e:  # pragma: no cover
            import traceback
            traceback.print_exc()
            print("Re-rendering failed:", e)

    if cfg["dataset"] in cfg.get("reconstruction_datasets", []):
        try:
            from point_slam_tpu.tools.mesher import mesh_from_renders
            mesh_path = os.path.join(out_dir, "mesh", "final_mesh.ply")
            mesh_from_renders(slam, out_dir, mesh_path,
                              voxel=cfg["meshing"].get("voxel",
                                                       5.0 / 512.0))
            results["mesh"] = mesh_path
            if cfg["meshing"]["eval_rec"]:
                rec = eval_reconstruction(slam, cfg, mesh_path, out_dir)
                if rec:
                    results.update(rec)
                    print({k: round(v, 3) for k, v in rec.items()})
        except Exception as e:  # pragma: no cover
            import traceback
            traceback.print_exc()
            print("Meshing failed:", e)

    # temp cleanup + mapping.save_ckpts semantics (src/Mapper.py:933-941):
    # drop the re-render scratch dir; drop checkpoints only when save_ckpts
    # is false AND the trajectory eval succeeded (a failed eval forces
    # checkpoints to survive for post-mortem, src/Mapper.py:811-813)
    import shutil
    rend = os.path.join(out_dir, "rendered_every_frame")
    if os.path.exists(rend):
        shutil.rmtree(rend)
    if not cfg["mapping"].get("save_ckpts", True) and ate_ok:
        ck = os.path.join(out_dir, "ckpts")
        if os.path.exists(ck):
            shutil.rmtree(ck)

    return results
