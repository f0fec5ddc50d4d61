"""Data-parallel ray sharding over an 8-device CPU mesh.

Verifies the multi-chip path (parallel/mesh.py): the mapping step jits with
rays sharded over 'dp' and gradients all-reduced by GSPMD, including the BA
and exposure variants, and the dp result tracks the single-device result.
"""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from point_slam_tpu.config import load_config
from point_slam_tpu.datasets import get_dataset
from point_slam_tpu.mapper import Mapper
from point_slam_tpu.models import decoders as D
from point_slam_tpu.parallel import mesh as pmesh

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tiny_cfg(dp=1, ba=False, exposure=False):
    cfg = load_config(os.path.join(HERE, "configs", "Synthetic", "room.yaml"),
                      os.path.join(HERE, "configs", "point_slam.yaml"))
    cfg["synthetic"].update({"n_frames": 8, "angular_step": 0.02})
    cfg["cam"].update({"H": 32, "W": 40, "fx": 30.0, "fy": 30.0,
                       "cx": 19.5, "cy": 15.5})
    cfg["mapping"].update({
        "pixels": 64 * max(dp, 1), "pixels_adding": 64,
        "pixels_based_on_color_grad": 16, "iters": 3, "iters_first": 3,
        "geo_iter_first": 1, "mapping_window_size": 3, "keyframe_every": 1,
        "BA": ba})
    cfg["model"]["encode_exposure"] = exposure
    cfg["tpu"].update({"point_capacity_init": 1 << 11,
                       "point_capacity_max": 1 << 14,
                       "grid_table_size": 1 << 12,
                       "grid_max_per_cell": 32,
                       "data_parallel": dp})
    cfg["verbose"] = False
    return cfg


def run_frames(cfg, n_map=6):
    ds = get_dataset(cfg)
    rng = np.random.default_rng(cfg["setup_seed"])
    params = D.init_decoders(jax.random.key(cfg["setup_seed"]), cfg)
    mapper = Mapper(cfg, params, len(ds), rng)
    stats = []
    for i in range(n_map):
        _, color, depth, c2w = ds[i]
        st = mapper.map_frame(i, color, depth, c2w, c2w)
        stats.append(st)
    return mapper, stats


@pytest.mark.parametrize("ba,exposure", [(False, False), (True, False),
                                         (False, True)])
def test_dp8_mapping_runs(ba, exposure):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = pmesh.make_mesh(8)
    pmesh.set_mesh(mesh)
    try:
        cfg = tiny_cfg(dp=8, ba=ba, exposure=exposure)
        mapper, stats = run_frames(cfg)
        assert stats[-1]["n_points"] > 0
        packed = np.asarray(mapper.cloud.packed[:mapper.n_points_host])
        assert np.isfinite(packed).all()
        assert all(np.isfinite(s["geo_loss"]) for s in stats)
    finally:
        pmesh.set_mesh(None)


def test_dp_matches_single_device():
    """Same seed, same ray budget: dp=8 must track dp=1 (ray sharding only
    changes the reduction layout, not the math; tolerance covers reduction
    order)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg1 = tiny_cfg(dp=1)
    # same TOTAL pixel budget for an apples-to-apples run
    cfg1["mapping"]["pixels"] = 64 * 8
    m1, s1 = run_frames(cfg1, n_map=3)

    mesh = pmesh.make_mesh(8)
    pmesh.set_mesh(mesh)
    try:
        cfg8 = tiny_cfg(dp=8)
        m8, s8 = run_frames(cfg8, n_map=3)
    finally:
        pmesh.set_mesh(None)

    assert m1.n_points_host == m8.n_points_host
    p1 = np.asarray(m1.cloud.packed[:m1.n_points_host])
    p8 = np.asarray(m8.cloud.packed[:m8.n_points_host])
    # positions identical; features agree to reduction-order tolerance
    np.testing.assert_array_equal(p1[:, 64:67], p8[:, 64:67])
    np.testing.assert_allclose(p1[:, :64], p8[:, :64], rtol=2e-3, atol=2e-3)


def test_dp8_mapping_with_ray_knn():
    """The Pallas ray-shared kNN must compose with shard_map/GSPMD ray
    sharding (interpret mode on the CPU mesh; the real kernel on TPU)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = pmesh.make_mesh(8)
    pmesh.set_mesh(mesh)
    try:
        cfg = tiny_cfg(dp=8)
        cfg["tpu"]["ray_knn"] = True
        mapper, stats = run_frames(cfg, n_map=3)
        assert stats[-1]["n_points"] > 0
        packed = np.asarray(mapper.cloud.packed[:mapper.n_points_host])
        assert np.isfinite(packed).all()
    finally:
        pmesh.set_mesh(None)


def run_track(cfg):
    from point_slam_tpu.tracker import Tracker
    ds = get_dataset(cfg)
    rng = np.random.default_rng(cfg["setup_seed"])
    params = D.init_decoders(jax.random.key(cfg["setup_seed"]), cfg)
    mapper = Mapper(cfg, params, len(ds), rng)
    est = np.zeros((len(ds), 4, 4), np.float32)
    for i in range(3):
        _, color, depth, c2w = ds[i]
        mapper.map_frame(i, color, depth, c2w, c2w)
        est[i] = c2w
    tracker = Tracker(cfg, len(ds))
    _, color, depth, c2w = ds[3]
    _, r_query, _, _ = mapper.radius_maps(jnp.asarray(color))
    res = tracker.track_frame(3, color, depth, c2w, est, mapper, r_query)
    return res


def test_dp_tracking_matches_single_device():
    """Tracker rays shard over dp; same seed + same ray budget must give the
    same pose to reduction-order tolerance."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg1 = tiny_cfg(dp=1)
    cfg1["mapping"]["pixels"] = 64 * 8
    cfg1["tracking"].update({"pixels": 64 * 8, "iters": 6})
    res1 = run_track(cfg1)

    mesh = pmesh.make_mesh(8)
    pmesh.set_mesh(mesh)
    try:
        cfg8 = tiny_cfg(dp=8)
        cfg8["tracking"].update({"pixels": 64 * 8, "iters": 6})
        res8 = run_track(cfg8)
    finally:
        pmesh.set_mesh(None)

    assert res1["tracked"] and res8["tracked"]
    np.testing.assert_allclose(res1["best_loss"], res8["best_loss"],
                               rtol=5e-3)
    np.testing.assert_allclose(res1["c2w"], res8["c2w"], rtol=2e-3, atol=2e-4)


def test_dp8_mapping_with_fused_knn_table():
    """The fused (coords|ids) cell table composes with the shard_map kNN
    dispatch under dp=8 (interpret-mode kernel on the CPU mesh)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = pmesh.make_mesh(8)
    pmesh.set_mesh(mesh)
    try:
        cfg = tiny_cfg(dp=8)
        cfg["tpu"]["ray_knn"] = True
        cfg["tpu"]["knn_packed_coords"] = "fused"
        mapper, stats = run_frames(cfg, n_map=3)
        assert stats[-1]["n_points"] > 0
        packed = np.asarray(mapper.cloud.packed[:mapper.n_points_host])
        assert np.isfinite(packed).all()
    finally:
        pmesh.set_mesh(None)
