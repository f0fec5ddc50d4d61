"""Production ray-kNN stage split + gather-layout calibration (round 5).

Times the SHIPPED path (ray_grid_knn on a PackedGridIndex, probes=27,
C=64) at the real bench workload (5000 rays x 5 samples, 22.5k live
points, cell 0.16), split into rungs:

  s1 probes      _box_probes only (pattern compaction + hash + dedup)
  s2 +gathers    + the two plane gathers (pxyz + pid at probe width)
  s3 full        + the Pallas d2/top-8 kernel (= production ray_grid_knn)

and answers the fused-plane question BEFORE building it: is the bucket-row
gather ROW-count bound (then ONE (TABLE+1, 2C) row per probe halves its
cost) or BYTE bound (then fusing saves nothing — the round-2 quad-planar
negative)? Calibration gathers at the same 135k row count:

  g64   (TABLE+1,  64) i32 rows  (256 B)  — the current per-plane shape
  g128  (TABLE+1, 128) i32 rows  (512 B)  — the fused-row shape
  g2x64 two separate 64-wide gathers      — the current total

If g128 ~= g64  -> row-bound, fused plane saves a full plane gather.
If g128 ~= 2x g64 -> byte-bound, fused plane saves nothing.

Run on TPU: python profiling/knn_prod_stages.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from point_slam_tpu.ops import knn
from point_slam_tpu.ops.knn import _box_probes

R, NS, K = 5000, 5, 8
NPTS = 22_500
CAP = 1 << 17
CELL = 0.16
TABLE = 1 << 16
C = 64
PROBES = 27
N = 30

rng = np.random.default_rng(0)
u = rng.uniform(0, 6, (NPTS, 2)).astype(np.float32)
pts = np.stack([u[:, 0], u[:, 1], 2.0 + 0.3 * np.sin(u[:, 0] * 3)], -1
               ).astype(np.float32)
pos = np.full((CAP, 3), 1e6, np.float32)
pos[:NPTS] = pts
index = knn.build_packed_grid_index(
    jnp.asarray(pos), jnp.asarray(NPTS), jnp.asarray(CELL), TABLE, C)

o = np.concatenate([rng.uniform(0.5, 5.5, (R, 2)), np.zeros((R, 1))],
                   -1).astype(np.float32)
d = np.concatenate([rng.normal(0, 0.05, (R, 2)), np.ones((R, 1))],
                   -1).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
depth = (2.0 + 0.3 * np.sin(o[:, 0] * 3)).astype(np.float32)
t = np.linspace(0.98, 1.02, NS).astype(np.float32)
zv = depth[:, None] * t[None, :]
q_ray = jnp.asarray(o[:, None, :] + d[:, None, :] * zv[..., None])

# fused-plane prototype: [:, :C] coords, [:, C:] id bits
fused = jnp.concatenate(
    [index.pxyz,
     jax.lax.bitcast_convert_type(index.pid, jnp.int32)], axis=1)

BIG = dict(index=index, q=q_ray, fused=fused)
jax.block_until_ready(jax.tree_util.tree_leaves(BIG))


def chain(name, step):
    @jax.jit
    def run(key, big):
        return jax.lax.fori_loop(0, N, lambda i, k: step(k, big), key)
    k0 = jax.random.key(0)
    t0 = time.time()
    float(jax.random.key_data(run(k0, BIG))[0])
    ct = time.time() - t0
    t0 = time.time()
    float(jax.random.key_data(run(k0, BIG))[0])
    dt = (time.time() - t0) / N
    print(f"{name}: {dt * 1e3:7.2f} ms/iter (compile {ct:.0f}s)", flush=True)
    return dt


def mix(k, *xs):
    s = sum((jnp.sum(x) * 0.0).astype(jnp.int32) for x in xs)
    return jax.random.fold_in(k, s + 1)


def jitter(k, b):
    return b["q"] + 0.002 * jax.random.normal(k, b["q"].shape)


def probe_rows(k, b):
    q = jitter(k, b)
    rows, compact = _box_probes(q, b["index"].cell_size, TABLE, PROBES)
    return rows, compact


def s_probes(k, b):
    rows, compact = probe_rows(k, b)
    return mix(k, rows, compact)


def s_gathers(k, b):
    rows, compact = probe_rows(k, b)
    cv = b["index"].pxyz[rows]
    ci = b["index"].pid[rows]
    return mix(k, cv, ci, compact)


def s_full(k, b):
    q = jitter(k, b)
    dists, idx, valid, compact = knn.ray_grid_knn(
        b["index"], q, k=K, probes=PROBES)
    return mix(k, dists, idx, valid, compact)


fused_index = knn.build_fused_grid_index(
    jnp.asarray(pos), jnp.asarray(NPTS), jnp.asarray(CELL), TABLE, C)
BIG["findex"] = fused_index
jax.block_until_ready(jax.tree_util.tree_leaves(BIG))


def s_full_fused(k, b):
    q = jitter(k, b)
    dists, idx, valid, compact = knn.ray_grid_knn(
        b["findex"], q, k=K, probes=PROBES)
    return mix(k, dists, idx, valid, compact)


def g_one_plane(k, b):
    rows, _ = probe_rows(k, b)
    return mix(k, b["index"].pxyz[rows])


def g_two_planes(k, b):
    rows, _ = probe_rows(k, b)
    return mix(k, b["index"].pxyz[rows], b["index"].pid[rows])


def g_fused_wide(k, b):
    rows, _ = probe_rows(k, b)
    return mix(k, b["fused"][rows])


t1 = chain("s1 probes            ", s_probes)
t2 = chain("s2 +plane gathers    ", s_gathers)
t3 = chain("s3 full ray_grid_knn ", s_full)
t3f = chain("s3f full FUSED plane ", s_full_fused)
print(f"-> probes {t1 * 1e3:.2f} | gathers {(t2 - t1) * 1e3:.2f} | "
      f"pallas d2/top8 {(t3 - t2) * 1e3:.2f} ms | fused full "
      f"{t3f * 1e3:.2f} (vs {t3 * 1e3:.2f})", flush=True)

g1 = chain("g  one 64-wide plane ", g_one_plane)
g2 = chain("g  two 64-wide planes", g_two_planes)
g3 = chain("g  one 128-wide fused", g_fused_wide)
base = t1
print(f"-> g64 {(g1 - base) * 1e3:.2f} | g2x64 {(g2 - base) * 1e3:.2f} | "
      f"g128 {(g3 - base) * 1e3:.2f} ms  "
      f"(g128~g64 -> row-bound, fuse wins; g128~g2x64 -> byte-bound)",
      flush=True)
