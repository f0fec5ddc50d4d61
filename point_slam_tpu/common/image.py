"""Image-space ops: grayscale, Sobel gradients, dynamic radius maps,
masked order statistics. Pure JAX (replaces the reference's skimage/scipy
usage, SURVEY §2.3 N4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# skimage rgb2gray weights (ITU-R 601-2 as used by skimage.color.rgb2gray).
_GRAY_W = jnp.array([0.2125, 0.7154, 0.0721], dtype=jnp.float32)

# skimage sobel_h kernel: horizontal *edges* (gradient along rows), /4.
_SOBEL_H = jnp.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], dtype=jnp.float32) / 4.0
_SOBEL_V = _SOBEL_H.T


def rgb2gray(img: jnp.ndarray) -> jnp.ndarray:
    """(H,W,3) float RGB -> (H,W) luminance, skimage-compatible."""
    return img.astype(jnp.float32) @ _GRAY_W


@jax.jit
def decode_wire_frame(packed: jnp.ndarray, depth_inv_scale: jnp.ndarray):
    """Device-side decode of a dataset wire frame (datasets.wire): one
    (H,W,5) u8 array -> (color f32 [0,1], depth f32 meters), bit-identical
    to the host dequantization in datasets.dequantize_wire (same f32
    multiplies). Lets the host->device transfer ride at sensor width in ONE
    put (4.1 MB vs 13.1 MB f32 + two link round-trips at 680x1200 — the
    remote-device link is ~50 MB/s with ~40 ms/put RTT)."""
    color = packed[..., :3].astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    du16 = jax.lax.bitcast_convert_type(packed[..., 3:5], jnp.uint16)
    depth = du16.astype(jnp.float32) * depth_inv_scale.astype(jnp.float32)
    return color, depth


@jax.jit
def encode_wire_frame(color: jnp.ndarray, depth: jnp.ndarray,
                      depth_scale: jnp.ndarray) -> jnp.ndarray:
    """Device-side inverse of decode_wire_frame: f32 color/depth ->
    (H,W,5) u8. Exact round-trip for values already on the sensor lattice
    (color == k/255, depth == k/scale — which is every frame the SLAM loop
    sees, since datasets quantize at the source). Used by the keyframe
    store to hold keyframes at wire width (4x less HBM / host RAM, and 4x
    fewer bytes on every host-ring window upload)."""
    cu8 = jnp.clip(jnp.rint(color * jnp.float32(255.0)), 0, 255) \
        .astype(jnp.uint8)
    du16 = jnp.clip(jnp.rint(depth * depth_scale.astype(jnp.float32)),
                    0, 65535).astype(jnp.uint16)
    return jnp.concatenate(
        [cu8, jax.lax.bitcast_convert_type(du16, jnp.uint8)], axis=-1)


def _conv2_reflect(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """2D correlation with edge-duplicating reflect padding (scipy.ndimage
    'reflect' == numpy 'symmetric'), the skimage sobel boundary mode."""
    padded = jnp.pad(img, 1, mode="symmetric")
    # correlation == convolution with flipped kernel; lax conv does correlation
    out = jax.lax.conv_general_dilated(
        padded[None, None, :, :], kernel[None, None, :, :],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out[0, 0]


def sobel_h(img: jnp.ndarray) -> jnp.ndarray:
    return _conv2_reflect(img, _SOBEL_H)


def sobel_v(img: jnp.ndarray) -> jnp.ndarray:
    return _conv2_reflect(img, _SOBEL_V)


def color_gradient_magnitude(color: jnp.ndarray) -> jnp.ndarray:
    """|∇gray(color)| via Sobel, (H,W). Parity: src/Tracker.py:236-240."""
    intensity = rgb2gray(color)
    gy = sobel_h(intensity)
    gx = sobel_v(intensity)
    return jnp.sqrt(gx * gx + gy * gy)


def piecewise_linear(x: jnp.ndarray, xs, ys) -> jnp.ndarray:
    """scipy.interpolate.interp1d-style piecewise-linear map (no extrapolation;
    inputs are pre-clipped by the callers, matching reference usage)."""
    return jnp.interp(x, jnp.asarray(xs, jnp.float32), jnp.asarray(ys, jnp.float32))


def dynamic_radius_maps(color: jnp.ndarray, radius_add_max: float,
                        radius_add_min: float, radius_query_ratio: float,
                        color_grad_threshold: float):
    """Per-pixel (r_add, r_query) from color gradients.

    Parity: src/Tracker.py:235-250 / src/Mapper.py:686-701 — gradient magnitude
    clipped to [0, thr], mapped through the piecewise-linear ramp
    [0, 0.01, thr] -> [r_max, r_max, r_min] (and x ratio for query).
    """
    g = jnp.clip(color_gradient_magnitude(color), 0.0, color_grad_threshold)
    xs = [0.0, 0.01, color_grad_threshold]
    r_add = piecewise_linear(g, xs, [radius_add_max, radius_add_max, radius_add_min])
    r_query = piecewise_linear(
        g, xs, [radius_query_ratio * radius_add_max,
                radius_query_ratio * radius_add_max,
                radius_query_ratio * radius_add_min])
    return r_add, r_query


def masked_median_sort(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median over masked entries via a full sort (the reference
    implementation masked_median is checked against)."""
    big = jnp.asarray(jnp.inf, x.dtype)
    vals = jnp.sort(jnp.where(mask, x, big))
    n = jnp.sum(mask)
    idx = jnp.maximum(n - 1, 0) // 2
    return vals[idx]


def masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median over masked entries, torch.median semantics (lower middle:
    sorted[(n-1)//2]). Returns +inf if the mask is empty.

    EXACT selection without a sort: 32-step bitwise radix descent over the
    monotonic f32<->uint order embedding — bit-identical to
    masked_median_sort on any finite input incl. negatives and +-0
    (property-tested), but O(32 n) elementwise work instead of a full
    device sort. This runs once per mapping/tracking iteration on the ray
    depth batch (src/Mapper.py:507-509 computes the batch median per
    iteration), where the 5000-element sort was a measurable slice of the
    sampling rung (profiling/sample_stages.py)."""
    x = jnp.asarray(x)
    big = jnp.asarray(jnp.inf, x.dtype)
    v = jnp.where(mask, x, big)
    b = jax.lax.bitcast_convert_type(v.astype(jnp.float32), jnp.int32)
    u = jnp.where(b < 0, ~b, b | jnp.int32(-2147483648)).astype(jnp.uint32)
    n = jnp.sum(mask)
    target = (jnp.maximum(n - 1, 0) // 2).astype(jnp.uint32)

    def body(i, carry):
        prefix, k_rem = carry
        shift = 31 - i
        # elements matching the decided high bits with current bit 0
        zeros = jnp.sum(u >> shift == prefix >> shift).astype(jnp.uint32)
        go_high = k_rem >= zeros
        bit = jnp.uint32(1) << shift
        return (jnp.where(go_high, prefix | bit, prefix),
                jnp.where(go_high, k_rem - zeros, k_rem))

    prefix, _ = jax.lax.fori_loop(0, 32, body, (jnp.uint32(0), target))
    bi = jnp.where((prefix & jnp.uint32(0x80000000)) != 0,
                   (prefix & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32),
                   ~prefix.astype(jnp.int32))
    val = jax.lax.bitcast_convert_type(bi, jnp.float32).astype(x.dtype)
    return jnp.where(n > 0, val, big)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    n = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, x, 0.0)) / n


def masked_max(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.max(jnp.where(mask, x, -jnp.inf))
