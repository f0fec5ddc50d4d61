"""TSDF fusion in JAX (replaces Open3D ScalableTSDFVolume, N2a).

Weighted-average truncated signed distance integration over a dense
axis-aligned grid bounded by the observed scene (the reference integrates
rendered RGB-D at voxel 5/512 m, trunc 0.04 m, depth_trunc 30 —
src/tools/get_mesh_tsdf_fusion.py:291-333). Voxel updates run as a chunked
jit; extraction goes through marching tetrahedra (tools/marching.py).

Camera model: the framework's native x-right / y-up / z-back convention is
used directly (the reference flips axes twice to round-trip through Open3D's
y-down convention — a no-op end to end).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


class TSDFVolume:
    def __init__(self, origin, dims, voxel: float = 5.0 / 512.0,
                 sdf_trunc: float = 0.04, depth_trunc: float = 30.0,
                 normal_weighting: bool = False):
        self.origin = np.asarray(origin, np.float32)
        self.dims = tuple(int(d) for d in dims)
        self.voxel = float(voxel)
        self.trunc = float(sdf_trunc)
        self.depth_trunc = float(depth_trunc)
        # cos(view angle) integration weights (beyond the reference's plain
        # projective TSDF): slanted observations carry a depth-direction
        # bias up to trunc*(1/cos-1), so down-weighting them sharpens
        # oblique walls. Off by default for reference parity.
        self.normal_weighting = bool(normal_weighting)
        n = int(np.prod(self.dims))
        self.tsdf = jnp.zeros((n,), jnp.float32)
        self.weight = jnp.zeros((n,), jnp.float32)
        self.color = jnp.zeros((n, 3), jnp.float32)
        self._centers_chunked = None
        self.chunk = 1 << 22

    @classmethod
    def from_bounds(cls, lo, hi, voxel=5.0 / 512.0, sdf_trunc=0.04,
                    margin=0.1, normal_weighting: bool = False):
        lo = np.asarray(lo, np.float64) - margin
        hi = np.asarray(hi, np.float64) + margin
        dims = np.maximum(np.ceil((hi - lo) / voxel).astype(int) + 1, 2)
        return cls(lo, dims, voxel, sdf_trunc,
                   normal_weighting=normal_weighting)

    def _centers(self, start: int, size: int) -> jnp.ndarray:
        nx, ny, nz = self.dims
        idx = jnp.arange(start, start + size)
        x = idx // (ny * nz)
        y = (idx // nz) % ny
        z = idx % nz
        grid = jnp.stack([x, y, z], -1).astype(jnp.float32)
        return grid * self.voxel + jnp.asarray(self.origin)

    def integrate(self, depth: np.ndarray, color: np.ndarray,
                  c2w: np.ndarray, fx, fy, cx, cy) -> None:
        """Fuse one RGB-D frame (depth (H,W) meters, color (H,W,3) [0,1])."""
        w2c = jnp.asarray(np.linalg.inv(np.asarray(c2w, np.float64)),
                          jnp.float32)
        depth = jnp.asarray(depth, jnp.float32)
        color = jnp.asarray(color, jnp.float32)
        if self.normal_weighting:
            wmap = _cos_weight_map(depth, float(fx), float(fy),
                                   float(cx), float(cy))
        else:
            wmap = jnp.ones_like(depth)
        n = self.tsdf.shape[0]
        for start in range(0, n, self.chunk):
            size = min(self.chunk, n - start)
            centers = self._centers(start, size)
            t, w, c = _integrate_chunk(
                self.tsdf[start:start + size],
                self.weight[start:start + size],
                self.color[start:start + size],
                centers, w2c, depth, color, wmap,
                float(fx), float(fy), float(cx), float(cy),
                self.trunc, self.depth_trunc)
            self.tsdf = self.tsdf.at[start:start + size].set(t)
            self.weight = self.weight.at[start:start + size].set(w)
            self.color = self.color.at[start:start + size].set(c)

    def extract_mesh(self, min_component_verts: Optional[int] = None):
        """Marching-tets over observed voxels. Returns (verts, faces, colors).

        The grids cross the (slow, ~50 MB/s remote-TPU) link wire-format:
        tsdf is a weighted mean in [-1, 1] -> i16 (max vertex error
        trunc/32767, micrometers); weight is consumed only as >0 validity
        -> u8; color is a weighted mean in [0, 1] -> u8 (exactly the PLY
        output precision). 20 bytes/voxel -> 6, i.e. 3.8 GB -> 1.1 GB at a
        ScanNet-scale 190M-voxel grid.
        """
        from point_slam_tpu.tools.marching import (
            connected_components_filter, marching_tetrahedra)
        sdf16, wgt8, col8 = _wire_grids(self.tsdf, self.weight, self.color)
        sdf = (np.asarray(sdf16).astype(np.float32) / 32767.0) \
            .reshape(self.dims)
        wgt = np.asarray(wgt8).reshape(self.dims)
        col = (np.asarray(col8).astype(np.float32) / 255.0) \
            .reshape(self.dims + (3,))
        verts, faces, vcols = marching_tetrahedra(
            sdf, 0.0, self.origin, self.voxel, weight=wgt, color=col)
        if min_component_verts and len(verts):
            verts, faces, keep = connected_components_filter(
                verts, faces, min_component_verts)
            if vcols is not None:
                vcols = vcols[keep]
        return verts, faces, vcols


@jax.jit
def _wire_grids(tsdf, weight, color):
    """Quantize the fused grids for the host fetch (see extract_mesh)."""
    sdf16 = jnp.round(jnp.clip(tsdf, -1.0, 1.0) * 32767.0).astype(jnp.int16)
    wgt8 = (weight > 0).astype(jnp.uint8)
    col8 = jnp.round(jnp.clip(color, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    return sdf16, wgt8, col8


@jax.jit
def _cos_weight_map(depth, fx, fy, cx, cy):
    """Per-pixel |cos| between the surface normal (from depth-image finite
    differences) and the viewing ray, floored at 0.1 so every observation
    still contributes. Invalid-depth neighborhoods fall back to weight 1."""
    h, w = depth.shape
    jj, ii = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    dirs = jnp.stack([(ii - cx) / fx, -(jj - cy) / fy,
                      -jnp.ones_like(ii)], -1)
    pts = dirs * depth[..., None]                            # camera space
    dx = jnp.roll(pts, -1, axis=1) - jnp.roll(pts, 1, axis=1)
    dy = jnp.roll(pts, -1, axis=0) - jnp.roll(pts, 1, axis=0)
    nrm = jnp.cross(dx, dy)
    nlen = jnp.linalg.norm(nrm, axis=-1)
    view = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    cos = jnp.abs(jnp.sum(nrm * view, -1)) / jnp.maximum(nlen, 1e-12)
    ok = ((depth > 0)
          & (jnp.roll(depth, -1, 1) > 0) & (jnp.roll(depth, 1, 1) > 0)
          & (jnp.roll(depth, -1, 0) > 0) & (jnp.roll(depth, 1, 0) > 0)
          & (nlen > 1e-12))
    return jnp.where(ok, jnp.maximum(cos, 0.1), 1.0)


@functools.partial(jax.jit, static_argnames=())
def _integrate_chunk(tsdf, weight, color_acc, centers, w2c, depth_img,
                     color_img, wmap, fx, fy, cx, cy, trunc, depth_trunc):
    from point_slam_tpu.common.camera import project_points
    h, w = depth_img.shape
    u, v, z = project_points(centers, w2c, fx, fy, cx, cy)
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    inside = (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h) & (z < 0)
    ui = jnp.clip(ui, 0, w - 1)
    vi = jnp.clip(vi, 0, h - 1)
    d = depth_img[vi, ui]
    z_depth = -z
    sdf = d - z_depth
    valid = inside & (d > 0) & (d < depth_trunc) & (sdf >= -trunc)
    tsdf_new = jnp.minimum(1.0, sdf / trunc)
    w_obs = wmap[vi, ui]
    w_new = weight + w_obs
    t_out = jnp.where(valid, (tsdf * weight + tsdf_new * w_obs) / w_new, tsdf)
    c_pix = color_img[vi, ui]
    c_out = jnp.where(valid[:, None],
                      (color_acc * weight[:, None] + c_pix * w_obs[:, None])
                      / w_new[:, None],
                      color_acc)
    w_out = jnp.where(valid, w_new, weight)
    return t_out, w_out, c_out
