"""v6: pattern-table probe compaction (64 -> 48 slots, no sort/scatter).

The box-probe validity pattern depends only on per-axis extents in {3,4}:
8 patterns, each with a static permutation putting valid offsets first
(ordered center-out, so a truncated (4,4,4) box drops corner cells).
"""
import sys
sys.path.insert(0, "/root/repo/profiling")
from knn_pallas2 import *   # noqa
from knn_pallas2 import _OFF64, CELLJ, _hash_cells

P3 = 48
_LANE_MASK3 = 4095  # 48*64 = 3072

OFF_NP = np.array([[x, y, z] for x in range(4) for y in range(4)
                   for z in range(4)], np.int64)

# per-pattern permutation: valid offsets first (center-out), invalid after
PERMS = np.zeros((8, P3), np.int32)
NVALID = np.zeros(8, np.int32)
for pat in range(8):
    ex, ey, ez = (pat >> 2 & 1) + 3, (pat >> 1 & 1) + 3, (pat & 1) + 3
    ok = (OFF_NP[:, 0] < ex) & (OFF_NP[:, 1] < ey) & (OFF_NP[:, 2] < ez)
    center = (np.array([ex, ey, ez]) - 1) / 2.0
    d = np.abs(OFF_NP - center).max(1) + 1e-3 * np.abs(OFF_NP - center).sum(1)
    order = np.lexsort((np.arange(64), d, ~ok))   # valid first, center-out
    PERMS[pat] = order[:P3]
    NVALID[pat] = min(int(ok.sum()), P3)
PERMS_J = jnp.asarray(PERMS)
# static per-pattern slot-validity: slot j real iff j < NVALID[pat]
SLOT_OK = jnp.asarray(np.arange(P3)[None, :] < NVALID[:, None])  # (8, P3)


def box_probes_v6(q):
    qc = jnp.floor(q / CELLJ).astype(jnp.int32)
    cmin = jnp.min(qc, axis=1) - 1
    cmax = jnp.max(qc, axis=1) + 1
    start = jnp.where(cmax - cmin + 1 > 4, cmin + 1, cmin)
    ext = jnp.clip(cmax - start + 1, 3, 4)                  # (R,3)
    pattern = ((ext[:, 0] - 3) * 4 + (ext[:, 1] - 3) * 2
               + (ext[:, 2] - 3))                           # (R,)
    cells = start[:, None, :] + _OFF64[None]                # (R,64,3)
    h = _hash_cells(cells, TABLE).astype(jnp.int32)         # (R,64)
    perm = PERMS_J[pattern]                                 # (R,48)
    hp = jnp.take_along_axis(h, perm, axis=1)               # (R,48)
    hp = jnp.where(SLOT_OK[pattern], hp, TABLE)
    dup = (hp[:, :, None] == hp[:, None, :]) & (
        jnp.arange(P3)[None, :, None] > jnp.arange(P3)[None, None, :])
    return jnp.where(jnp.any(dup, axis=-1), TABLE, hp)


def _kernel3(cand_ref, qx_ref, qy_ref, qz_ref, out_p_ref, out_i_ref):
    PC = P3 * C
    X = cand_ref[:, 0 * PC:1 * PC]
    Y = cand_ref[:, 1 * PC:2 * PC]
    Z = cand_ref[:, 2 * PC:3 * PC]
    IDs = cand_ref[:, 3 * PC:4 * PC]
    lane = jax.lax.broadcasted_iota(jnp.int32, X.shape, 1)
    for s in range(NS):
        dx = X - qx_ref[:, s][:, None]
        dy = Y - qy_ref[:, s][:, None]
        dz = Z - qz_ref[:, s][:, None]
        d2 = dx * dx + dy * dy + dz * dz
        packed = ((jax.lax.bitcast_convert_type(d2, jnp.int32)
                   & ~jnp.int32(_LANE_MASK3)) | lane)
        for kk in range(K):
            m = jnp.min(packed, axis=-1, keepdims=True)
            sel = lane == (m & _LANE_MASK3)
            out_p_ref[:, s * K + kk] = m[:, 0]
            out_i_ref[:, s * K + kk] = jnp.sum(
                jnp.where(sel, IDs, 0.0), axis=-1)
            packed = jnp.where(sel, jnp.int32(0x7FFFFFFF), packed)


def pallas_topk3(cand, qx, qy, qz, r):
    bs_c = pl.BlockSpec((R_BLK, 4 * P3 * C), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    bs_q = pl.BlockSpec((R_BLK, NS), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    bs_o = pl.BlockSpec((R_BLK, NS * K), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel3, grid=(r // R_BLK,),
        in_specs=[bs_c, bs_q, bs_q, bs_q],
        out_specs=(bs_o, bs_o),
        out_shape=(jax.ShapeDtypeStruct((r, NS * K), jnp.int32),
                   jax.ShapeDtypeStruct((r, NS * K), jnp.float32)),
    )(cand, qx, qy, qz)


def knn_rays_v6(table, q):
    r = q.shape[0]
    pad = (-r) % R_BLK
    if pad:
        q = jnp.concatenate([q, jnp.zeros((pad, NS, 3), jnp.float32)])
    rp = r + pad
    probes = box_probes_v6(q)
    blocks = table[probes]                                  # (R,48,C,4)
    cand = jnp.transpose(blocks, (0, 3, 1, 2)).reshape(rp, 4 * P3 * C)
    packed, ids = pallas_topk3(cand, q[..., 0], q[..., 1], q[..., 2], rp)
    valid = packed < jnp.int32(0x7F800000)
    idx = jnp.where(valid, ids, 0.0).astype(jnp.int32)
    return packed[:r], idx[:r], valid[:r]


def v6(k, b):
    q = jitter(k, b)
    packed, idx, valid = knn_rays_v6(b["table"], q)
    return mix(k, packed, idx)


if __name__ == "__main__":
    qj = jnp.asarray(q_ray)
    d0, i0, m0 = knn.grid_knn(index0, qj.reshape(-1, 3), k=K)
    _, i6, m6 = knn_rays_v6(table_s, qj)
    i6 = np.asarray(i6).reshape(-1, K)       # (R*NS, K)
    m6 = np.asarray(m6).reshape(-1, K)
    w = np.asarray(points)[i6]
    qq = np.asarray(qj).reshape(-1, 1, 3)
    d6 = np.where(m6, ((w - qq) ** 2).sum(-1), np.inf)
    a = np.sort(np.asarray(d0), axis=1)
    bd = np.sort(d6, axis=1)
    ok = np.isclose(a, bd, rtol=1e-5, atol=1e-10) | ~np.isfinite(a)
    print(f"v6 dist-set match vs v0: {ok.mean()*100:.4f}%")
    chain("v4 (P=64)            ", v4)
    chain("v6 (P=48 pattern)    ", v6)


def box_probes_v7(q):
    r = q.shape[0]
    qc = jnp.floor(q / CELLJ).astype(jnp.int32)
    cmin = jnp.min(qc, axis=1) - 1
    cmax = jnp.max(qc, axis=1) + 1
    start = jnp.where(cmax - cmin + 1 > 4, cmin + 1, cmin)
    ext = jnp.clip(cmax - start + 1, 3, 4)
    pattern = ((ext[:, 0] - 3) * 4 + (ext[:, 1] - 3) * 2 + (ext[:, 2] - 3))
    cells = start[:, None, :] + _OFF64[None]
    h = _hash_cells(cells, TABLE).astype(jnp.int32)
    # static permutation per pattern; pick per-ray via one flat row gather
    stack = jnp.stack([jnp.where(SLOT_OK[p], h[:, PERMS[p]], TABLE)
                       for p in range(8)])                   # (8,R,48)
    flat = stack.reshape(8 * r, P3)
    hp = flat[pattern * r + jnp.arange(r, dtype=jnp.int32)]
    dup = (hp[:, :, None] == hp[:, None, :]) & (
        jnp.arange(P3)[None, :, None] > jnp.arange(P3)[None, None, :])
    return jnp.where(jnp.any(dup, axis=-1), TABLE, hp)


def knn_rays_v7(table, q):
    r = q.shape[0]
    pad = (-r) % R_BLK
    if pad:
        q = jnp.concatenate([q, jnp.zeros((pad, NS, 3), jnp.float32)])
    rp = r + pad
    probes = box_probes_v7(q)
    blocks = table[probes]
    cand = jnp.transpose(blocks, (0, 3, 1, 2)).reshape(rp, 4 * P3 * C)
    packed, ids = pallas_topk3(cand, q[..., 0], q[..., 1], q[..., 2], rp)
    valid = packed < jnp.int32(0x7F800000)
    idx = jnp.where(valid, ids, 0.0).astype(jnp.int32)
    return packed[:r], idx[:r], valid[:r]


def v7(k, b):
    q = jitter(k, b)
    packed, idx, valid = knn_rays_v7(b["table"], q)
    return mix(k, packed, idx)
