import numpy as np
import jax
import jax.numpy as jnp

from point_slam_tpu import pointcloud as pc
from point_slam_tpu.ops import knn


def straight_rays(n, depth=2.0, spacing=0.5):
    """n parallel rays looking down -z from a line along x."""
    o = np.zeros((n, 3), np.float32)
    o[:, 0] = np.arange(n) * spacing
    d = np.tile(np.array([0, 0, -1], np.float32), (n, 1))
    dep = np.full(n, depth, np.float32)
    col = np.random.default_rng(0).random((n, 3)).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d), jnp.asarray(dep), jnp.asarray(col)


def test_add_points_first_batch():
    state = pc.init_cloud(256, 32, 3)
    index = pc.build_index(state, 0.16, table_size=1 << 12)
    o, d, dep, col = straight_rays(5)
    state, n_acc = pc.add_points(
        state, index, o, d, dep, col, jnp.ones(5, bool), jnp.full(5, 0.04),
        jax.random.key(0), 0.98, 1.02, n_add=3)
    assert int(n_acc) == 5
    assert int(state.n_points) == 15
    assert int(state.n_inputs) == 5
    pos = np.asarray(state.pos[:15]).reshape(5, 3, 3)
    # three points along each ray spanning [0.98d, 1.02d]
    np.testing.assert_allclose(pos[:, 0, 2], -0.98 * 2.0, atol=1e-5)
    np.testing.assert_allclose(pos[:, 1, 2], -2.0, atol=1e-5)
    np.testing.assert_allclose(pos[:, 2, 2], -1.02 * 2.0, atol=1e-5)
    # input buffers
    np.testing.assert_allclose(np.asarray(state.input_pos[:5])[:, 2], -2.0,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(state.input_rgb[:5]),
                               np.asarray(col) * 255, atol=1e-4)
    # features ~ N(0, 0.1): nonzero, bounded
    feats = np.asarray(state.geo_feats[:15])
    assert 0.01 < np.abs(feats).mean() < 0.3


def test_add_points_dedup():
    state = pc.init_cloud(256, 32, 3)
    index = pc.build_index(state, 0.16, table_size=1 << 12)
    o, d, dep, col = straight_rays(5)
    valid = jnp.ones(5, bool)
    r_add = jnp.full(5, 0.04)
    state, _ = pc.add_points(state, index, o, d, dep, col, valid, r_add,
                             jax.random.key(0), 0.98, 1.02, n_add=3)
    index = pc.build_index(state, 0.16, table_size=1 << 12)
    # identical rays again: everything deduplicated
    state2, n2 = pc.add_points(state, index, o, d, dep, col, valid, r_add,
                               jax.random.key(1), 0.98, 1.02, n_add=3)
    assert int(n2) == 0
    assert int(state2.n_points) == int(state.n_points)
    # slightly shifted beyond the radius: all accepted
    o2 = o + jnp.asarray([0.25, 0.0, 0.0])
    state3, n3 = pc.add_points(state, index, o2, d, dep, col, valid, r_add,
                               jax.random.key(2), 0.98, 1.02, n_add=3)
    assert int(n3) == 5


def test_add_points_depth_filter_and_mask():
    state = pc.init_cloud(256, 32, 3)
    index = pc.build_index(state, 0.16, table_size=1 << 12)
    o, d, dep, col = straight_rays(4)
    dep = dep.at[1].set(0.0)               # zero depth -> rejected
    valid = jnp.asarray([True, True, False, True])
    state, n = pc.add_points(state, index, o, d, dep, col, valid,
                             jnp.full(4, 0.04), jax.random.key(0), 0.98, 1.02,
                             n_add=3)
    assert int(n) == 2
    assert int(state.n_points) == 6


def test_grow_cloud_preserves():
    state = pc.init_cloud(64, 32, 3)
    index = pc.build_index(state, 0.16, table_size=1 << 10)
    o, d, dep, col = straight_rays(3)
    state, _ = pc.add_points(state, index, o, d, dep, col, jnp.ones(3, bool),
                             jnp.full(3, 0.04), jax.random.key(0), 0.98, 1.02)
    big = pc.grow_cloud(state, 128, 3)
    assert big.pos.shape == (128, 3)
    np.testing.assert_array_equal(np.asarray(big.pos[:9]),
                                  np.asarray(state.pos[:9]))
    assert int(big.n_points) == 9


def test_sample_near_pcl():
    state = pc.init_cloud(1024, 32, 3)
    index = pc.build_index(state, 0.2, table_size=1 << 12)
    o, d, dep, col = straight_rays(2, depth=2.0, spacing=100.0)
    state, _ = pc.add_points(state, index, o, d, dep, col, jnp.ones(2, bool),
                             jnp.full(2, 0.04), jax.random.key(0), 0.98, 1.02)
    index = pc.build_index(state, 0.2, table_size=1 << 12)
    # ray 0 passes through the cloud near z=-2; ray 1 misses everything
    miss_o = jnp.asarray([[0., 0., 0.], [5000., 0., 0.]], jnp.float32)
    miss_d = jnp.asarray([[0., 0., -1.], [0., 0., -1.]], jnp.float32)
    z_vals, invalid = pc.sample_near_pcl(index, miss_o, miss_d,
                                         0.3, jnp.asarray(4.0),
                                         jnp.full(2 * 25, 0.2), num=5)
    inv = np.asarray(invalid)
    assert not inv[0] and inv[1]
    z0 = np.asarray(z_vals[0])
    assert z0.min() >= 1.5 and z0.max() <= 2.6  # clusters near depth 2
    # invalid ray falls back to uniform near..far
    np.testing.assert_allclose(np.asarray(z_vals[1]),
                               np.linspace(0.3, 4.0, 5), atol=1e-5)


def test_frustum_mask_matches_numpy_reference():
    import cv2
    rng = np.random.default_rng(3)
    h, w = 48, 64
    fx = fy = 50.0
    cx, cy = 31.5, 23.5
    depth = rng.uniform(1.0, 3.0, (h, w)).astype(np.float32)
    depth[rng.random((h, w)) < 0.1] = 0.0
    pts = rng.uniform(-3, 3, (500, 3)).astype(np.float32)
    pts[:, 2] = -rng.uniform(0.2, 4.0, 500)
    c2w = np.eye(4, dtype=np.float32)
    w2c = np.linalg.inv(c2w)
    edge = -4

    # numpy/cv2 reference implementing src/Mapper.py:120-168 semantics
    ones = np.ones((500, 1), np.float32)
    cam = (np.concatenate([pts, ones], 1) @ w2c.T)[:, :3]
    cam[:, 0] *= -1
    k = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
    uv_h = cam @ k.T
    z = uv_h[:, 2:3] + 1e-5
    uv = uv_h[:, :2] / z
    uv = uv.astype(np.float32)
    depths = cv2.remap(depth, uv[None, :, 0], uv[None, :, 1],
                       interpolation=cv2.INTER_LINEAR)[0]
    mask_ref = ((uv[:, 0] < w - edge) & (uv[:, 0] > edge)
                & (uv[:, 1] < h - edge) & (uv[:, 1] > edge))
    dd = depths.copy()
    dd[dd == 0] = dd.max()
    mask_ref &= (0 <= -z[:, 0]) & (-z[:, 0] <= dd + 0.5)

    ours = np.asarray(pc.frustum_mask(jnp.asarray(pts), jnp.asarray(500),
                                      jnp.asarray(w2c), jnp.asarray(depth),
                                      fx, fy, cx, cy, edge))
    agree = (ours == mask_ref).mean()
    assert agree > 0.99, f"frustum mask agreement {agree}"
