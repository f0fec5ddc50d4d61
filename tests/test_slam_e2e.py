"""End-to-end SLAM on the synthetic room: joint tracking + mapping."""
import os

import numpy as np
import pytest

from point_slam_tpu.config import load_config
from point_slam_tpu.slam import PointSLAM
from point_slam_tpu.tools.eval_ate import evaluate_ate

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def e2e_cfg(tmp_path, n=12):
    cfg = load_config(os.path.join(HERE, "configs", "Synthetic", "room.yaml"),
                      os.path.join(HERE, "configs", "point_slam.yaml"))
    cfg["synthetic"]["n_frames"] = n
    cfg["synthetic"]["angular_step"] = 0.02   # ~1.6 cm/frame, Replica-like
    cfg["cam"].update({"H": 48, "W": 64, "fx": 40.0, "fy": 40.0,
                       "cx": 31.5, "cy": 23.5})
    cfg["tracking"].update({"pixels": 300, "iters": 20,
                            "ignore_edge_W": 5, "ignore_edge_H": 5})
    cfg["mapping"].update({
        "pixels": 400, "pixels_adding": 200, "pixels_based_on_color_grad": 50,
        "iters": 20, "iters_first": 30, "geo_iter_first": 10,
        "mapping_window_size": 4, "keyframe_every": 4, "every_frame": 2,
        "lazy_start": False, "color_refine": False,
    })
    cfg["tpu"].update({"point_capacity_init": 1 << 13,
                       "point_capacity_max": 1 << 16,
                       "grid_table_size": 1 << 14,
                       "grid_max_per_cell": 64})
    cfg["verbose"] = False
    cfg["data"]["output"] = str(tmp_path / "out")
    return cfg


@pytest.fixture(scope="module")
def slam_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    cfg = e2e_cfg(tmp)
    slam = PointSLAM(cfg)
    summary = slam.run()
    return slam, summary


def test_runs_all_frames(slam_run):
    slam, summary = slam_run
    assert summary["n_frames"] == 12
    assert summary["n_points"] > 200
    assert summary["keyframes"] == [0, 4, 8, 10]


def test_point_cloud_dumps(slam_run):
    """Final surface-cloud artifacts exist (src/Mapper.py:764-772: files
    written only at the last frame); the periodic (every-300-frames) path
    only mirrors an Object3D to the metrics sink (src/Mapper.py:756-763),
    writing no files."""
    slam, _ = slam_run
    out = slam.output
    assert os.path.exists(os.path.join(out, "final_point_cloud.ply"))
    assert os.path.exists(os.path.join(out, "final_point_cloud.npy"))
    assert os.path.exists(os.path.join(out, "npc_cloud.npy"))
    pc = np.load(os.path.join(out, "final_point_cloud.npy"))
    assert pc.shape[1] == 6 and np.isfinite(pc).all()
    before = set(os.listdir(out))
    logged = []
    orig = slam.mlog.log_points
    slam.mlog.log_points = lambda name, pos, col=None, step=None: \
        logged.append((name, step))
    try:
        slam._dump_point_cloud(log_points_step=300, write_files=False)
    finally:
        slam.mlog.log_points = orig
    assert logged == [("input_pc", 300)]
    assert set(os.listdir(out)) == before  # periodic dump writes NO files


def test_tracking_stays_on_trajectory(slam_run):
    slam, summary = slam_run
    ate = evaluate_ate(summary["gt_c2w_list"], summary["estimate_c2w_list"],
                       align=False)
    # tiny budgets, synthetic scene: a loose-but-meaningful bound; random
    # poses would be off by ~0.5 m on this trajectory
    assert ate["absolute_translational_error.rmse"] < 0.10, ate
    # per-frame estimates must be finite rigid transforms
    est = summary["estimate_c2w_list"]
    assert np.isfinite(est).all()
    for p in est:
        rrt = p[:3, :3] @ p[:3, :3].T
        np.testing.assert_allclose(rrt, np.eye(3), atol=1e-3)


def test_bundle_adjustment_runs(tmp_path):
    """With mapping.BA on, window keyframe cameras are optimized once >4
    keyframes exist (src/Mapper.py:375-397,727-737); the run must stay on
    trajectory and refine poses without blowing up."""
    cfg = e2e_cfg(tmp_path, n=14)
    cfg["mapping"]["BA"] = True
    cfg["mapping"]["keyframe_every"] = 2   # reach >4 keyframes quickly
    # indivisible by the window size so some rays land on PADDING slots:
    # regression for the zero-quaternion padding poses (NaN poison)
    cfg["mapping"]["pixels"] = 401
    slam = PointSLAM(cfg)
    summary = slam.run()
    ate = evaluate_ate(summary["gt_c2w_list"], summary["estimate_c2w_list"],
                       align=False)
    # this tiny-budget config hovers ~0.09-0.13 regardless of BA (measured
    # BA=False at the same pixel count: 0.118); the bound is a smoke check
    # that BA neither NaNs nor derails the trajectory — random poses would
    # be off by ~0.5 m
    assert ate["absolute_translational_error.rmse"] < 0.20, ate
    est = summary["estimate_c2w_list"]
    assert np.isfinite(est).all()           # NaN-padding regression guard
    assert np.isfinite(np.asarray(
        slam.mapper.cloud.packed[:slam.mapper.n_points_host])).all()
    for p in est:
        np.testing.assert_allclose(p[:3, :3] @ p[:3, :3].T, np.eye(3),
                                   atol=1e-3)


def test_midrun_resume(slam_run, tmp_path):
    """Run 0..6, checkpoint, resume a FRESH process-state at frame 7: with
    the full state (cloud, decoders, keyframe ring, PRNG streams) restored,
    the resumed run must reproduce the continuous run's trajectory exactly
    (no reference equivalent — run.py --resume is new, SURVEY §5)."""
    from point_slam_tpu.utils.logger import save_checkpoint
    continuous, csummary = slam_run

    cfg = e2e_cfg(tmp_path, n=12)
    slam1 = PointSLAM(cfg)
    slam1.run(stop=6)
    ck = str(tmp_path / "out" / "ckpts" / "00006.npz")
    save_checkpoint(ck, slam1, idx=6)

    cfg2 = e2e_cfg(tmp_path, n=12)
    cfg2["data"]["output"] = str(tmp_path / "out2")
    slam2 = PointSLAM(cfg2)
    summary = slam2.run(resume_from=ck)
    assert summary["n_frames"] == 12
    assert slam2.mapper.n_points_host >= slam1.mapper.n_points_host
    np.testing.assert_allclose(summary["estimate_c2w_list"][:7],
                               slam1.estimate_c2w_list[:7], atol=1e-6)
    # resumed == continuous, bit-exact
    np.testing.assert_array_equal(summary["estimate_c2w_list"],
                                  csummary["estimate_c2w_list"])
    np.testing.assert_array_equal(
        np.asarray(slam2.mapper.cloud.packed[:slam2.mapper.n_points_host]),
        np.asarray(continuous.mapper.cloud.packed[
            :continuous.mapper.n_points_host]))


def test_sensor_holes_and_exposure(tmp_path):
    """TUM/ScanNet-shaped run: depth dropout (zero-depth pixels exercise the
    sample_near_pcl zero-depth ray path, src/neural_point.py:217-277) plus
    per-keyframe exposure compensation (src/Mapper.py:529-548)."""
    cfg = e2e_cfg(tmp_path, n=10)
    cfg["synthetic"]["depth_dropout"] = 0.15
    cfg["rendering"]["sample_near_pcl"] = True
    cfg["model"]["encode_exposure"] = True
    slam = PointSLAM(cfg)
    summary = slam.run()
    assert summary["n_frames"] == 10
    assert np.isfinite(summary["estimate_c2w_list"]).all()
    assert np.isfinite(np.asarray(
        slam.mapper.cloud.packed[:slam.mapper.n_points_host])).all()
    # exposure latents were optimized per mapped frame
    assert len(slam.mapper.exposure_feat_all) > 0
    ate = evaluate_ate(summary["gt_c2w_list"], summary["estimate_c2w_list"],
                       align=False)
    assert ate["absolute_translational_error.rmse"] < 0.20, ate
    # per-frame color-decoder snapshots (src/Mapper.py:631-635) exist and
    # roundtrip through the checkpoint
    n_snaps = len(slam.mapper.color_decoder_snapshots)
    assert n_snaps == len(slam.mapper.exposure_feat_all)
    from point_slam_tpu.utils.logger import (
        load_checkpoint, save_checkpoint, restore_color_decoder_snapshots)
    import jax
    path = str(tmp_path / "expo_ck.npz")
    save_checkpoint(path, slam)
    orig = slam.mapper.color_decoder_snapshots
    slam.mapper.color_decoder_snapshots = []
    restore_color_decoder_snapshots(load_checkpoint(path), slam.mapper)
    restored = slam.mapper.color_decoder_snapshots
    assert len(restored) == n_snaps
    for a, b in zip(jax.tree.leaves(orig[0]), jax.tree.leaves(restored[0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(orig[-1]), jax.tree.leaves(restored[-1])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_roundtrip(slam_run, tmp_path):
    from point_slam_tpu.utils.logger import (load_checkpoint,
                                             restore_cloud_and_params,
                                             save_checkpoint)
    slam, summary = slam_run
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, slam)
    ckpt = load_checkpoint(path)
    assert int(ckpt["pts_num"]) == summary["n_points"]
    before = np.asarray(slam.mapper.cloud.geo_feats[:10]).copy()
    restore_cloud_and_params(ckpt, slam.mapper)
    after = np.asarray(slam.mapper.cloud.geo_feats[:10])
    np.testing.assert_array_equal(before, after)
    assert slam.mapper.keyframe_list == summary["keyframes"]


def test_tracker_color_grad_preselection(tmp_path):
    """tracking.sample_with_color_grad picks rays from the top-gradient pool
    (src/Tracker.py:254-260) — the run must stay on trajectory."""
    cfg = e2e_cfg(tmp_path, n=8)
    cfg["tracking"]["sample_with_color_grad"] = True
    slam = PointSLAM(cfg)
    summary = slam.run()
    ate = evaluate_ate(summary["gt_c2w_list"], summary["estimate_c2w_list"],
                       align=False)
    assert ate["absolute_translational_error.rmse"] < 0.15, ate


def test_get_model_factory():
    from point_slam_tpu.config import load_config, get_model
    import os
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(here, "configs", "Synthetic", "room.yaml"),
                      os.path.join(here, "configs", "point_slam.yaml"))
    params = get_model(cfg)
    assert "geo" in params and "col" in params


def test_final_frame_color_refinement(tmp_path):
    """color_refine on: the last frame reruns the window with doubled iters,
    geo stage off, frozen color decoder, color_lr/10 (src/Mapper.py:706-736).
    The run must complete, keep the map NaN-free, and not degrade re-renders.
    """
    import jax
    cfg = e2e_cfg(tmp_path, n=8)
    cfg["mapping"].update({"color_refine": True, "iters": 10,
                           "iters_first": 20})
    slam = PointSLAM(cfg)
    summary = slam.run()
    assert summary["n_frames"] == 8
    packed = np.asarray(slam.mapper.cloud.packed)
    n = int(slam.mapper.n_points_host)
    assert n > 100 and np.isfinite(packed[:n]).all()
    # the refinement keeps decoders usable: a rendered frame stays finite
    from point_slam_tpu import renderer as R
    _, color, depth, c2w = slam.dataset[7]
    import jax.numpy as jnp
    dep, unc, col = R.render_img(
        slam.mapper.params, slam.mapper.cloud, slam.mapper.index,
        jnp.asarray(summary["estimate_c2w_list"][7]),
        (slam.mapper.ms.fx, slam.mapper.ms.fy, slam.mapper.ms.cx,
         slam.mapper.ms.cy),
        (cfg["cam"]["H"], cfg["cam"]["W"]), slam.mapper.rc,
        jax.random.key(0), gt_depth=jnp.asarray(depth),
        r_query=jnp.asarray(slam.mapper.radius_maps(jnp.asarray(color))[1]))
    assert np.isfinite(np.asarray(dep)).all()
    assert np.isfinite(np.asarray(col)).all()


def test_end_of_run_reconstruction_eval(tmp_path):
    """With reconstruction_datasets including synthetic and eval_rec on, the
    end-of-run driver meshes the renders and scores F-score against the
    dataset's analytic GT surface (reference chain src/Mapper.py:901-931)."""
    cfg = e2e_cfg(tmp_path, n=8)
    cfg["mapping"].update({"iters": 15, "iters_first": 25})
    cfg["reconstruction_datasets"] = ["synthetic"]
    cfg["render_datasets"] = []
    cfg["meshing"].update({"eval_rec": True, "voxel": 0.06,
                           "eval_2d": True, "eval_2d_n_imgs": 4,
                           "mesh_freq": 2})
    slam = PointSLAM(cfg)
    slam.run()
    from point_slam_tpu.tools.evaluate import run_end_of_run_eval
    res = run_end_of_run_eval(slam, slam.output)
    assert "recon_F_score" in res, res
    assert res["recon_precision"] > 5.0          # coarse voxel, tiny budget
    assert np.isfinite(res["recon_accuracy"])
    # virtual-view 2D depth-L1 wired behind meshing.eval_2d
    assert "recon_depth_l1_2d" in res and np.isfinite(res["recon_depth_l1_2d"])
    import os
    assert os.path.exists(os.path.join(slam.output, "mesh", "gt_culled.ply"))
    # meshing.mesh_freq writes intermediate meshes during TSDF integration
    import glob
    mids = glob.glob(os.path.join(slam.output, "mesh", "mid_mesh",
                                  "frame_*_mesh.ply"))
    assert mids, "mesh_freq produced no intermediate meshes"


def test_vis_inside_fires_in_both_loops(tmp_path):
    """tracking/mapping vis_inside write panels from INSIDE the optimization
    loops at chunk boundaries (src/Tracker.py:367-371, src/Mapper.py:441)."""
    import glob
    cfg = e2e_cfg(tmp_path, n=6)
    cfg["tracking"].update({"vis_freq": 1, "vis_inside": True,
                            "vis_inside_freq": 10, "iters": 20})
    cfg["mapping"].update({"vis_freq": 1, "vis_inside": True,
                           "vis_inside_freq": 8, "iters": 16})
    cfg["tpu"]["max_iters_per_launch"] = 8
    slam = PointSLAM(cfg)
    slam.run()
    track_panels = glob.glob(os.path.join(slam.output, "tracking_vis",
                                          "*.jpg"))
    map_panels = glob.glob(os.path.join(slam.output, "mapping_vis", "*.jpg"))
    assert track_panels, "tracking vis_inside produced no panels"
    assert map_panels, "mapping vis_inside produced no panels"
    # mid-loop iterations (not just the final one) appear in the filenames
    map_iters = {int(os.path.basename(p).split("_")[1][:4])
                 for p in map_panels}
    assert any(0 < it < 16 for it in map_iters) or 0 in map_iters, map_iters
    track_iters = {int(os.path.basename(p).split("_")[1][:4])
                   for p in track_panels}
    assert any(0 < it < 20 for it in track_iters), track_iters


def test_frozen_pretrained_geo_decoder(tmp_path):
    """The reference's frozen-PRETRAINED geometry decoder configuration
    (src/Point_SLAM.py:143-164 + mapping.fix_geo_decoder): a middle_fine.pt
    in the reference's layout converts (tools/convert_pretrained), loads
    into MLP_geometry, stays frozen through mapping, and the run works."""
    import torch
    import jax
    import jax.numpy as jnp
    from point_slam_tpu.models import decoders as D
    from point_slam_tpu.tools.convert_pretrained import convert

    cfg = e2e_cfg(tmp_path, n=6)
    params0 = D.init_decoders(jax.random.key(3), cfg)

    # fake NICE-SLAM ckpt with the reference's key layout
    # ('decoder.coarse.' prefix holds the middle decoder, quirky but real)
    rng = np.random.default_rng(5)
    model = {}

    def fake(dst, name):
        w = rng.normal(0, 0.1, dst["w"].shape[::-1]).astype(np.float32)
        b = rng.normal(0, 0.1, dst["b"].shape).astype(np.float32)
        model[f"decoder.coarse.{name}.weight"] = torch.from_numpy(w)
        model[f"decoder.coarse.{name}.bias"] = torch.from_numpy(b)
        return w, b

    geo = params0["geo"]
    w0, b0 = fake(geo["pts_linears"][0], "pts_linears.0")
    for i in range(1, len(geo["pts_linears"])):
        fake(geo["pts_linears"][i], f"pts_linears.{i}")
    for i in range(len(geo["fc_c"])):
        fake(geo["fc_c"][i], f"fc_c.{i}")
    fake(geo["output_linear"], "output_linear")
    # decoy keys the filter must skip
    model["encoder.coarse.conv.weight"] = torch.zeros(3, 3)
    model["decoder.fine.pts_linears.0.weight"] = torch.zeros(4, 4)
    pt = tmp_path / "middle_fine.pt"
    torch.save({"model": model}, pt)

    npz = tmp_path / "middle_fine.npz"
    n = convert(str(pt), str(npz))
    assert n == 2 * (len(geo["pts_linears"]) + len(geo["fc_c"]) + 1)

    loaded = D.load_pretrained_geo(params0, str(npz))
    np.testing.assert_array_equal(
        np.asarray(loaded["geo"]["pts_linears"][0]["w"]), w0.T)
    np.testing.assert_array_equal(
        np.asarray(loaded["geo"]["pts_linears"][0]["b"]), b0)

    # e2e: fix_geo_decoder stays ON (no auto-train fallback) and the
    # decoder is bit-frozen through mapping
    cfg["mapping"]["fix_geo_decoder"] = True
    cfg["pretrained_decoders"] = {"middle_fine": str(npz)}
    slam = PointSLAM(cfg)
    assert cfg["mapping"]["fix_geo_decoder"] is True
    geo_before = jax.tree.map(np.asarray, slam.mapper.params["geo"])
    summary = slam.run()
    assert summary["n_points"] > 0
    geo_after = jax.tree.map(np.asarray, slam.mapper.params["geo"])
    for a, b in zip(jax.tree_util.tree_leaves(geo_before),
                    jax.tree_util.tree_leaves(geo_after)):
        np.testing.assert_array_equal(a, b)


def test_packed_coords_e2e(tmp_path):
    """Full SLAM with tpu.knn_packed_coords=True: the lattice-packed kNN
    table (selection-only quantization, ops/knn.py) must keep tracking on
    the trajectory and densify a comparable cloud."""
    cfg = e2e_cfg(tmp_path, n=8)
    cfg["tpu"]["knn_packed_coords"] = True
    slam = PointSLAM(cfg)
    summary = slam.run()
    assert summary["n_frames"] == 8
    assert summary["n_points"] > 200
    ate = evaluate_ate(summary["gt_c2w_list"], summary["estimate_c2w_list"],
                       align=False)
    assert ate["absolute_translational_error.rmse"] < 0.10, ate
