import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from point_slam_tpu.config import load_config
from point_slam_tpu.datasets import get_dataset
from point_slam_tpu.mapper import Mapper
from point_slam_tpu.models import decoders as D
from point_slam_tpu import pointcloud as pc
from point_slam_tpu import renderer as R

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tiny_cfg():
    cfg = load_config(os.path.join(HERE, "configs", "Synthetic", "room.yaml"),
                      os.path.join(HERE, "configs", "point_slam.yaml"))
    cfg["synthetic"]["n_frames"] = 16
    cfg["cam"].update({"H": 48, "W": 64, "fx": 40.0, "fy": 40.0,
                       "cx": 31.5, "cy": 23.5})
    cfg["mapping"].update({
        "pixels": 400, "pixels_adding": 200, "pixels_based_on_color_grad": 50,
        "iters": 25, "iters_first": 40, "geo_iter_first": 15,
        "mapping_window_size": 4, "keyframe_every": 4, "every_frame": 2,
    })
    cfg["tpu"].update({"point_capacity_init": 1 << 13,
                       "point_capacity_max": 1 << 16,
                       "grid_table_size": 1 << 14,
                       "grid_max_per_cell": 64})
    return cfg


@pytest.fixture(scope="module")
def mapped():
    cfg = tiny_cfg()
    ds = get_dataset(cfg)
    rng = np.random.default_rng(cfg["setup_seed"])
    params = D.init_decoders(jax.random.key(cfg["setup_seed"]), cfg)
    mapper = Mapper(cfg, params, len(ds), rng)
    stats = []
    for idx in [0, 2, 4, 6]:
        _, color, depth, c2w = ds[idx]
        st = mapper.map_frame(idx, color, depth, c2w, c2w)
        stats.append(st)
    return cfg, ds, mapper, stats


def test_points_grow_and_dedup(mapped):
    cfg, ds, mapper, stats = mapped
    assert stats[0]["n_points"] > 100
    # later frames with overlapping views add fewer points than the first
    assert stats[1]["n_added"] < stats[0]["n_added"]
    assert mapper.n_points_host == int(mapper.cloud.n_points)
    assert mapper.n_points_host < mapper.cloud.pos.shape[0]


def test_losses_are_finite_and_decrease(mapped):
    cfg, ds, mapper, stats = mapped
    for st in stats:
        assert np.isfinite(st["geo_loss"]) and np.isfinite(st["color_loss"])
        assert st["n_mask"] > 0
    # per-ray geometry loss on the last mapped frame should beat the first
    per_ray_first = stats[0]["geo_loss"] / max(stats[0]["n_mask"], 1)
    per_ray_last = stats[-1]["geo_loss"] / max(stats[-1]["n_mask"], 1)
    assert per_ray_last < per_ray_first * 1.5  # not diverging


def test_keyframes_registered(mapped):
    cfg, ds, mapper, stats = mapped
    assert mapper.keyframe_list == [0, 4]
    assert 6 in mapper.selected_keyframes
    sel = mapper.selected_keyframes[6]
    assert sel[-1]["idx"] == 6


def test_iteration_budget_scaling(mapped):
    cfg, ds, mapper, stats = mapped
    it = cfg["mapping"]["iters"]
    assert stats[0]["n_iters"] == cfg["mapping"]["iters_first"]
    for st in stats[1:]:
        assert int(0.95 * it) <= st["n_iters"] <= 2 * it


def test_mapped_scene_renders_depth(mapped):
    """After a few mapped frames the radiance field should reproduce sensor
    depth to a few cm on the mapped view (the e2e acceptance of the slice)."""
    cfg, ds, mapper, stats = mapped
    _, color, depth, c2w = ds[0]
    r_add, r_query, _, _ = mapper.radius_maps(jnp.asarray(color))
    rc = mapper.rc._replace(ray_batch=512)
    dep, unc, col = R.render_img(
        mapper.params, mapper.cloud, mapper.index, jnp.asarray(c2w),
        (cfg["cam"]["fx"], cfg["cam"]["fy"], cfg["cam"]["cx"], cfg["cam"]["cy"]),
        depth.shape, rc, jax.random.key(0), jnp.asarray(depth), r_query)
    dep = np.asarray(dep)
    col = np.asarray(col)
    valid = (depth > 0) & (dep > 0)
    assert valid.mean() > 0.5
    depth_l1 = np.abs(dep[valid] - depth[valid]).mean()
    assert depth_l1 < 0.08, f"depth L1 {depth_l1:.3f} m too high"
    color_l1 = np.abs(col[valid] - color[valid]).mean()
    assert color_l1 < 0.25, f"color L1 {color_l1:.3f} too high"


def test_capacity_growth_rescales_table(tmp_path):
    """When the point buffer doubles, _ensure_capacity must keep the hash
    table at ~8 points/bucket and rebuild the index so densification dedup
    still sees every existing point (an overfull bucket silently drops)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from point_slam_tpu.config import load_config
    from point_slam_tpu.mapper import Mapper
    from point_slam_tpu.models import decoders as D
    from point_slam_tpu.ops import knn
    import point_slam_tpu.pointcloud as pc
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(here, "configs", "Synthetic", "room.yaml"),
                      os.path.join(here, "configs", "point_slam.yaml"))
    cfg["cam"].update({"H": 48, "W": 64, "fx": 40.0, "fy": 40.0,
                       "cx": 31.5, "cy": 23.5})
    cfg["tpu"].update({"point_capacity_init": 1 << 9,
                       "point_capacity_max": 1 << 15,
                       "grid_table_size": 1 << 5,      # tiny: forces scaling
                       "grid_max_per_cell": 32})
    cfg["verbose"] = False
    rng = np.random.default_rng(0)
    mapper = Mapper(cfg, D.init_decoders(jax.random.key(0), cfg), 10, rng)

    # seed points, then request capacity far beyond the current buffer
    npts = 400
    pts = rng.uniform(-1, 1, (npts, 3)).astype(np.float32)
    packed = mapper.cloud.packed.at[:npts, pc.POS_SL].set(jnp.asarray(pts))
    mapper.cloud = mapper.cloud._replace(
        packed=packed, n_points=jnp.asarray(npts, jnp.int32))
    mapper.n_points_host = npts
    mapper.index = pc.build_index(mapper.cloud, mapper.cell_size,
                                  mapper.table_size, mapper.max_per_cell)
    t0 = mapper.table_size
    mapper._ensure_capacity(8000)
    assert mapper.cloud.packed.shape[0] >= npts + 8000
    assert mapper.table_size > t0, "table must scale with capacity"
    # the rebuilt index still finds every point (vs brute force)
    q = jnp.asarray(pts[:64] + 0.01)
    gd, gi, gv = knn.grid_knn(mapper.index, q, k=8)
    bd, bi, bv = knn.brute_knn(mapper.cloud.pos, mapper.cloud.n_points, q, k=8)
    in_r = np.asarray(bd) < mapper.cell_size ** 2
    np.testing.assert_allclose(np.where(in_r, np.asarray(gd), 0.0),
                               np.where(in_r, np.asarray(bd), 0.0),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- keyframes

def test_keyframe_store_overflow_raises():
    """A full device ring must fail loudly, not silently drop keyframes
    (round-1 verdict: >budget runs quietly stopped extending the window)."""
    from point_slam_tpu.mapper import KeyframeStore
    cfg = tiny_cfg()
    cfg["tpu"]["keyframe_host_ring"] = False
    cfg["tpu"]["keyframe_device_budget"] = 4
    st = KeyframeStore(cfg, 8, 8, 1000, 8, keyframe_every=1)
    assert not st.host_mode and st.capacity == 4
    img = jnp.zeros((8, 8, 3)), jnp.zeros((8, 8))
    eye = np.eye(4, dtype=np.float32)
    for _ in range(4):
        st.append(*img, eye, eye, np.zeros(8, np.float32))
    with pytest.raises(RuntimeError, match="keyframe ring overflow"):
        st.append(*img, eye, eye, np.zeros(8, np.float32))


def test_keyframe_store_auto_host_mode():
    """'auto' switches to the host ring when the expected keyframe count
    exceeds the device budget, and every keyframe stays reachable."""
    from point_slam_tpu.mapper import KeyframeStore
    cfg = tiny_cfg()
    cfg["tpu"]["keyframe_device_budget"] = 4
    st = KeyframeStore(cfg, 8, 8, 1000, 8, keyframe_every=1)  # expects 1004
    assert st.host_mode
    rng = np.random.default_rng(0)
    for i in range(9):   # > device budget; must not raise or drop
        col = rng.uniform(size=(8, 8, 3)).astype(np.float32)
        st.append(jnp.asarray(col), jnp.full((8, 8), 1.0 * i),
                  np.eye(4), np.eye(4), np.zeros(8, np.float32))
    assert len(st) == 9
    w_color, w_depth, _, _, _ = st.gather_window([8, 0, 5], 6)
    # depth survives the u16 wire encoding to within half a quantum
    q = 0.5 / float(st.depth_scale)
    assert np.allclose(np.asarray(w_depth[0]), 8.0, atol=q)
    assert np.allclose(np.asarray(w_depth[1]), 0.0, atol=q)
    assert np.allclose(np.asarray(w_depth[2]), 5.0, atol=q)
    # the window color is the decode of the stored wire frame
    from point_slam_tpu.datasets import dequantize_wire
    c_ref, _ = dequantize_wire(st.frames[5], np.float32(st.inv_scale))
    np.testing.assert_array_equal(np.asarray(w_color[2]), c_ref)


def test_host_ring_matches_device_ring():
    """Mapping with the host-resident keyframe ring is bit-identical to the
    device ring (same PRNG streams, same window contents)."""
    cfg_a = tiny_cfg()
    cfg_a["tpu"]["keyframe_host_ring"] = False
    cfg_b = tiny_cfg()
    cfg_b["tpu"]["keyframe_host_ring"] = True

    results = []
    for cfg in (cfg_a, cfg_b):
        ds = get_dataset(cfg)
        rng = np.random.default_rng(cfg["setup_seed"])
        params = D.init_decoders(jax.random.key(cfg["setup_seed"]), cfg)
        mapper = Mapper(cfg, params, len(ds), rng)
        for idx in [0, 2, 4]:
            _, color, depth, c2w = ds[idx]
            mapper.map_frame(idx, color, depth, c2w, c2w)
        results.append(mapper)
    a, b = results
    assert not a.store.host_mode and b.store.host_mode
    assert a.keyframe_list == b.keyframe_list
    np.testing.assert_array_equal(np.asarray(a.cloud.packed),
                                  np.asarray(b.cloud.packed))
    la = jax.tree_util.tree_leaves(a.params)
    lb = jax.tree_util.tree_leaves(b.params)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_fused_row_adam_matches_reference_update():
    """ops/adam.update_rows (Pallas fused mask+moments+step) must match the
    plain update() with pre-masked gradients to ~1 ulp (XLA contracts
    a*x+b*y into FMA, the kernel may not; the formula is identical)."""
    from point_slam_tpu.ops import adam
    rng = np.random.default_rng(11)
    n, w = 2048, 72
    p = jnp.asarray(rng.standard_normal((n, w)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((n, w)), jnp.float32)
    m = jnp.asarray(0.1 * rng.standard_normal((n, w)), jnp.float32)
    v = jnp.asarray(0.01 * abs(rng.standard_normal((n, w))), jnp.float32)
    mask = jnp.asarray(rng.random(n) < 0.7)
    t_row = jnp.asarray(rng.integers(1, 40, w), jnp.float32)
    lr_row = jnp.asarray(rng.uniform(1e-4, 3e-2, w), jnp.float32)

    ref_p, ref_st = adam.update(
        p, g * mask[:, None].astype(jnp.float32),
        {"m": m, "v": v}, t_row, lr_row)
    fus_p, fus_st = adam.update_rows(
        p, g, {"m": m, "v": v}, t_row, lr_row, mask)
    np.testing.assert_allclose(np.asarray(ref_p), np.asarray(fus_p),
                               rtol=3e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(ref_st["m"]),
                               np.asarray(fus_st["m"]), rtol=3e-7, atol=3e-8)
    np.testing.assert_allclose(np.asarray(ref_st["v"]),
                               np.asarray(fus_st["v"]), rtol=3e-7, atol=3e-8)


def test_fused_adam_map_frame_matches_unfused(tmp_path):
    """A mapped frame with tpu.fused_adam on equals the unfused path (CPU
    interpret mode; bit-exactness is asserted at the adam-step level above,
    here the whole map_frame must agree; tolerance covers ulp-level FMA
    drift amplified over the frame's iterations)."""
    results = {}
    for fused in (False, True):
        cfg = tiny_cfg()
        cfg["data"]["output"] = str(tmp_path / f"fused_{fused}")
        cfg["tpu"]["fused_adam"] = fused
        rng = np.random.default_rng(3)
        params = D.init_decoders(jax.random.key(0), cfg)
        ds = get_dataset(cfg)
        mapper = Mapper(cfg, params, len(ds), rng)
        _, color, depth, c2w = ds[0]
        mapper.map_frame(0, color, depth, c2w, c2w)
        results[fused] = (np.asarray(mapper.cloud.packed),
                          int(mapper.cloud.n_points))
    assert results[False][1] == results[True][1]
    np.testing.assert_allclose(results[False][0], results[True][0],
                               rtol=1e-3, atol=1e-4)
