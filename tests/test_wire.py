"""Wire-format frame transfer tests (datasets.wire + decode_wire_frame).

Frames cross the host->device link as ONE (H,W,5) u8 array — u8 color plus
u16 depth bytes — because the link is RTT- and bandwidth-bound (measured
~40 ms/put + ~50 MB/s over the remote-device tunnel; 4.1 MB wire vs
13.1 MB f32 + two puts at Replica scale). These tests pin:

* host dequantization (datasets.dequantize_wire / __getitem__) and device
  decode (common.image.decode_wire_frame) are BIT-IDENTICAL;
* the quantization is lossless for sensor-native data (u8 PNG color /
  u16 PNG depth round-trip exactly — the reference pipeline never sees
  better than this, src/utils/datasets.py:120-134);
* the prefetcher's wire path yields the same frames as dataset[i];
* depth zero (invalid-pixel marker) survives exactly.
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from point_slam_tpu.config import load_config
from point_slam_tpu.datasets import get_dataset, dequantize_wire
from point_slam_tpu.common import image as image_ops
from point_slam_tpu.utils.prefetch import FramePrefetcher

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def ds():
    cfg = load_config(os.path.join(HERE, "configs", "Synthetic", "room.yaml"),
                      os.path.join(HERE, "configs", "point_slam.yaml"))
    cfg["synthetic"].update({"n_frames": 4, "depth_dropout": 0.02})
    cfg["cam"].update({"H": 48, "W": 64, "fx": 40.0, "fy": 40.0,
                       "cx": 31.5, "cy": 23.5})
    return get_dataset(cfg)


def test_wire_shape_and_host_device_parity(ds):
    i, packed, pose = ds.wire(1)
    assert packed.shape == (48, 64, 5) and packed.dtype == np.uint8
    _, c_host, d_host, pose2 = ds[1]
    assert np.array_equal(pose, pose2)

    c_dev, d_dev = image_ops.decode_wire_frame(
        jnp.asarray(packed), jnp.asarray(ds.depth_inv_scale))
    assert np.array_equal(np.asarray(c_dev), c_host)
    assert np.array_equal(np.asarray(d_dev), d_host)

    c2, d2 = dequantize_wire(packed, ds.depth_inv_scale)
    assert np.array_equal(c2, c_host) and np.array_equal(d2, d_host)


def test_wire_zero_depth_survives(ds):
    # depth_dropout injects exact zeros (sensor holes); they must stay 0.0
    _, _, depth, _ = ds[2]
    assert (depth == 0.0).any(), "fixture should contain dropout holes"
    _, packed, _ = ds.wire(2)
    _, d2 = dequantize_wire(packed, ds.depth_inv_scale)
    assert np.array_equal(d2 == 0.0, depth == 0.0)


def test_wire_lossless_for_sensor_native_data(ds):
    # u8 color / u16 depth that came FROM the u8/u16 lattice round-trips
    # exactly through quantize -> dequantize
    rng = np.random.default_rng(0)
    cu8 = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    du16 = rng.integers(0, 40000, (48, 64), dtype=np.uint16)
    inv = ds.depth_inv_scale
    color = cu8.astype(np.float32) * np.float32(1.0 / 255.0)
    depth = du16.astype(np.float32) * inv

    requant_c = np.clip(np.rint(color * np.float32(255.0)), 0, 255) \
        .astype(np.uint8)
    requant_d = np.clip(np.rint(depth * np.float32(ds.png_depth_scale)),
                        0, 65535).astype(np.uint16)
    assert np.array_equal(requant_c, cu8)
    assert np.array_equal(requant_d, du16)


def test_prefetcher_wire_path_matches_getitem(ds):
    inv = jnp.asarray(ds.depth_inv_scale)

    def stage(item):
        i, packed, c2w = item
        color, depth = image_ops.decode_wire_frame(jnp.asarray(packed), inv)
        return i, color, depth, c2w

    pf = FramePrefetcher(ds, depth=2, start=0, stop=4,
                         stage=stage, fetch=ds.wire)
    got = list(pf)
    assert [g[0] for g in got] == [0, 1, 2, 3]
    for i, color, depth, c2w in got:
        _, c_ref, d_ref, p_ref = ds[i]
        assert np.array_equal(np.asarray(color), c_ref)
        assert np.array_equal(np.asarray(depth), d_ref)
        assert np.array_equal(np.asarray(c2w), p_ref)
