"""Ray-shared kNN prototypes vs the per-sample grid_knn baseline.

The renderer queries kNN at R rays x ns=5 samples, with the samples of one
ray spanning only 0.04*depth (~8-20 cm) -- adjacent samples probe almost the
same 27-cell neighborhoods. Variants measured here:

  v0: grid_knn on the flattened (R*ns) queries           (current renderer)
  v1: dedup probe buckets per ray (budget M_PROBE), gather once per ray,
      per-sample top-k over the shared (M_PROBE*C) candidates  (exact, same
      results as v0 up to probe budget)
  v2: v1 + per-ray top-M preselection by point-to-segment distance, then
      per-sample top-k over only M candidates               (approximate)

Also prints the host-side distribution of unique probe buckets per ray to
justify the budget.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from point_slam_tpu.ops import knn
from point_slam_tpu.ops.knn import _hash_cells, _OFFSETS

CAP = 1 << 19
NPTS = 300_000
R = 5000
NS = 5
CELL = 0.16
TABLE = 1 << 16
C = 64
K = 8
M_PROBE = 48     # unique-bucket budget per ray
M_SEL = 64       # per-ray candidate preselection (v2)
N = 30

rng = np.random.default_rng(0)
# surface z = 2 + 0.3 sin(3x) over a 6x6 m patch; camera above looking down
u = rng.uniform(0, 6, (NPTS, 2)).astype(np.float32)
pts = np.stack([u[:, 0], u[:, 1], 2.0 + 0.3 * np.sin(u[:, 0] * 3)], -1
               ).astype(np.float32)
pos = np.full((CAP, 3), 1e6, np.float32)
pos[:NPTS] = pts
points = jnp.asarray(pos)
index = knn.build_grid_index(points, jnp.asarray(NPTS), jnp.asarray(CELL),
                             TABLE, C)

# ray-structured queries: origin per ray, direction ~ +z, samples at
# z in depth*[0.98, 1.02]
o = np.concatenate([rng.uniform(0.5, 5.5, (R, 2)), np.zeros((R, 1))],
                   -1).astype(np.float32)
d = np.concatenate([rng.normal(0, 0.05, (R, 2)), np.ones((R, 1))],
                   -1).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
depth = (2.0 + 0.3 * np.sin(o[:, 0] * 3)).astype(np.float32)
t = np.linspace(0.98, 1.02, NS).astype(np.float32)
zv = depth[:, None] * t[None, :]
q_ray = (o[:, None, :] + d[:, None, :] * zv[..., None]).astype(np.float32)

# --- host-side unique-probe stats
cells = np.floor(q_ray / CELL).astype(np.int64)
probe = cells[:, :, None, :] + np.asarray(_OFFSETS)[None, None]
keys = (probe[..., 0] * (1 << 42) + probe[..., 1] * (1 << 21) + probe[..., 2]
        ).reshape(R, NS * 27)
uniq = np.array([len(np.unique(k)) for k in keys])
print(f"unique probe cells/ray: mean {uniq.mean():.1f} p50 "
      f"{np.percentile(uniq,50):.0f} p95 {np.percentile(uniq,95):.0f} "
      f"max {uniq.max()}", flush=True)

BIG = dict(index=index, q=jnp.asarray(q_ray))


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
    print(f"{name}: {dt*1e3:7.2f} ms/iter (compile {ct:.0f}s)", flush=True)
    return dt


def mix(k, *xs):
    s = sum((jnp.sum(x) * 0.0).astype(jnp.int32) for x in xs)
    return jax.random.fold_in(k, s + 1)


def jitter(k, b):
    return b["q"] + 0.002 * jax.random.normal(k, b["q"].shape)


def v0(k, b):
    q = jitter(k, b).reshape(-1, 3)
    dists, idx, valid = knn.grid_knn(b["index"], q, k=K)
    return mix(k, dists, idx)


def ray_probes(q, index):
    """(R, M_PROBE) deduped probe buckets (sentinel TABLE where empty)."""
    qcells = jnp.floor(q / index.cell_size).astype(jnp.int32)      # (R,ns,3)
    hs = _hash_cells(qcells[:, :, None, :] + _OFFSETS[None, None],
                     TABLE).astype(jnp.int32).reshape(R, NS * 27)
    hs = jnp.sort(hs, axis=1)
    first = jnp.concatenate(
        [jnp.ones((R, 1), bool), hs[:, 1:] != hs[:, :-1]], axis=1)
    rank = jnp.cumsum(first, axis=1) - 1
    dst = jnp.where(first & (rank < M_PROBE), rank, M_PROBE)
    flat_dst = (jnp.arange(R, dtype=jnp.int32)[:, None] * (M_PROBE + 1)
                + dst).reshape(-1)
    probes = jnp.full((R * (M_PROBE + 1),), TABLE, jnp.int32)
    probes = probes.at[flat_dst].set(hs.reshape(-1), mode="drop")
    return probes.reshape(R, M_PROBE + 1)[:, :M_PROBE]


def gather_blocks(index, probes):
    """(R, M_PROBE*C, 4) candidates; sentinel probes -> +inf positions."""
    blocks = index.table[jnp.clip(probes, 0, TABLE - 1)]   # (R,M,C,4)
    bad = (probes >= TABLE)[:, :, None, None]
    blocks = jnp.where(bad, jnp.inf, blocks)
    return blocks.reshape(R, M_PROBE * C, 4)


def v1(k, b):
    q = jitter(k, b)
    index = b["index"]
    probes = ray_probes(q, index)
    cand = gather_blocks(index, probes)                    # (R, MC, 4)
    diff = cand[:, None, :, :3] - q[:, :, None, :]         # (R, ns, MC, 3)
    d2 = jnp.sum(diff * diff, axis=-1)                     # (R, ns, MC)
    neg, pos = jax.lax.top_k(-d2.reshape(R * NS, -1), K)
    ids = jnp.take_along_axis(
        jnp.broadcast_to(cand[:, None, :, 3], d2.shape).reshape(R * NS, -1),
        pos, axis=1)
    return mix(k, neg, ids)


def v2(k, b):
    q = jitter(k, b)
    index = b["index"]
    probes = ray_probes(q, index)
    cand = gather_blocks(index, probes)                    # (R, MC, 4)
    a, bb = q[:, 0, :], q[:, -1, :]                        # segment endpoints
    ab = bb - a
    denom = jnp.maximum(jnp.sum(ab * ab, axis=-1, keepdims=True), 1e-12)
    ap = cand[..., :3] - a[:, None, :]
    tt = jnp.clip(jnp.sum(ap * ab[:, None, :], -1) / denom, 0.0, 1.0)
    closest = a[:, None, :] + tt[..., None] * ab[:, None, :]
    dseg = jnp.sum((cand[..., :3] - closest) ** 2, axis=-1)  # (R, MC)
    _, selpos = jax.lax.top_k(-dseg, M_SEL)                  # (R, M_SEL)
    sel = jnp.take_along_axis(cand, selpos[..., None], axis=1)  # (R,M_SEL,4)
    diff = sel[:, None, :, :3] - q[:, :, None, :]            # (R,ns,M_SEL,3)
    d2 = jnp.sum(diff * diff, axis=-1)
    neg, pos = jax.lax.top_k(-d2.reshape(R * NS, -1), K)
    ids = jnp.take_along_axis(
        jnp.broadcast_to(sel[:, None, :, 3], d2.shape).reshape(R * NS, -1),
        pos, axis=1)
    return mix(k, neg, ids)


if __name__ == "__main__":
    # recall check (host): v1/v2 vs v0 on the un-jittered queries
    qj = jnp.asarray(q_ray)
    d0, i0, vmask0 = knn.grid_knn(index, qj.reshape(-1, 3), k=K)
    probes = ray_probes(qj, index)
    cand = gather_blocks(index, probes)
    diff = cand[:, None, :, :3] - qj[:, :, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    neg, pos = jax.lax.top_k(-d2.reshape(R * NS, -1), K)
    d1 = -neg
    match1 = np.mean(np.isclose(np.asarray(d0), np.asarray(d1),
                                rtol=1e-5, atol=1e-10) |
                     ~np.asarray(vmask0))
    print(f"v1 top-{K} dist match vs v0: {match1*100:.3f}%", flush=True)

    a, bb = qj[:, 0, :], qj[:, -1, :]
    ab = bb - a
    denom = jnp.maximum(jnp.sum(ab * ab, axis=-1, keepdims=True), 1e-12)
    ap = cand[..., :3] - a[:, None, :]
    tt = jnp.clip(jnp.sum(ap * ab[:, None, :], -1) / denom, 0.0, 1.0)
    closest = a[:, None, :] + tt[..., None] * ab[:, None, :]
    dseg = jnp.sum((cand[..., :3] - closest) ** 2, axis=-1)
    _, selpos = jax.lax.top_k(-dseg, M_SEL)
    sel = jnp.take_along_axis(cand, selpos[..., None], axis=1)
    diff = sel[:, None, :, :3] - qj[:, :, None, :]
    d2s = jnp.sum(diff * diff, axis=-1)
    neg2, _ = jax.lax.top_k(-d2s.reshape(R * NS, -1), K)
    d2v = -neg2
    match2 = np.mean(np.isclose(np.asarray(d0), np.asarray(d2v),
                                rtol=1e-5, atol=1e-10) |
                     ~np.asarray(vmask0))
    print(f"v2 top-{K} dist match vs v0: {match2*100:.3f}%", flush=True)

    chain("v0 per-sample grid_knn ", v0)
    chain("v1 ray-shared exact    ", v1)
    chain("v2 ray-shared + preselect", v2)
