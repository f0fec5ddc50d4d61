"""v8: positions-only candidate gather + epilogue winner-id gather.

The kernel's packed (d2|lane) min-reduction already identifies winners by
lane; the id of lane l is table[probes[r, l//C], l%C, 3]. Recovering ids in
an epilogue gather of (R, ns*k) scalars lets the candidate gather skip the
id plane (4 -> 3 planes, -25% bytes) and the kernel skip the 40 masked-sum
id extractions (one 3072-wide reduction per (sample, k)).
"""
import sys
sys.path.insert(0, "/root/repo/profiling")
from knn_pallas2 import *   # noqa
from knn_pallas2 import _OFF64, CELLJ, _hash_cells
from knn_pallas3 import box_probes_v7, P3, _LANE_MASK3, v7

PC3 = P3 * C


def _kernel4(cand_ref, qx_ref, qy_ref, qz_ref, out_p_ref):
    X = cand_ref[:, 0 * PC3:1 * PC3]
    Y = cand_ref[:, 1 * PC3:2 * PC3]
    Z = cand_ref[:, 2 * PC3:3 * PC3]
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
            out_p_ref[:, s * K + kk] = m[:, 0]
            packed = jnp.where(lane == (m & _LANE_MASK3),
                               jnp.int32(0x7FFFFFFF), packed)


def pallas_topk4(cand, qx, qy, qz, r):
    bs_c = pl.BlockSpec((R_BLK, 3 * PC3), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    bs_q = pl.BlockSpec((R_BLK, NS), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    bs_o = pl.BlockSpec((R_BLK, NS * K), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel4, grid=(r // R_BLK,),
        in_specs=[bs_c, bs_q, bs_q, bs_q],
        out_specs=bs_o,
        out_shape=jax.ShapeDtypeStruct((r, NS * K), jnp.int32),
    )(cand, qx, qy, qz)


def knn_rays_v8(table, q):
    """table here: (TABLE+1, C, 4) f32 as before (ids in plane 3)."""
    r = q.shape[0]
    pad = (-r) % R_BLK
    if pad:
        q = jnp.concatenate([q, jnp.zeros((pad, NS, 3), jnp.float32)])
    rp = r + pad
    probes = box_probes_v7(q)                               # (R,48)
    blocks = table[probes]                                  # (R,48,C,4)
    pos_planes = jnp.transpose(blocks[..., :3], (0, 3, 1, 2)).reshape(
        rp, 3 * PC3)
    packed = pallas_topk4(pos_planes, q[..., 0], q[..., 1], q[..., 2], rp)
    lane = packed & _LANE_MASK3                             # (R, NS*K)
    win_h = jnp.take_along_axis(probes, lane // C, axis=1)  # (R, NS*K)
    flat_ids = table.reshape(-1, 4)[:, 3]
    ids = flat_ids[win_h * C + (lane % C)]
    valid = packed < jnp.int32(0x7F800000)
    idx = jnp.where(valid, ids, 0.0).astype(jnp.int32)
    return packed[:r], idx[:r], valid[:r]


def v8(k, b):
    q = jitter(k, b)
    packed, idx, valid = knn_rays_v8(b["table"], q)
    return mix(k, packed, idx)


# v8b: candidate gather already position-only in HBM: a separate
# (TABLE+1, C, 3)->(TABLE+1, 3C) position table so the gather fetches
# 768B rows without slicing a 4-plane block (XLA may fuse the slice into
# the gather anyway; measure).
def make_pos_table(table):
    t = table[..., :3]                                      # (T+1,C,3)
    return jnp.transpose(t, (0, 2, 1)).reshape(t.shape[0], 3 * C)


def knn_rays_v8b(table, pos_tab, q):
    r = q.shape[0]
    pad = (-r) % R_BLK
    if pad:
        q = jnp.concatenate([q, jnp.zeros((pad, NS, 3), jnp.float32)])
    rp = r + pad
    probes = box_probes_v7(q)
    rows = pos_tab[probes]                                  # (R,48,3C)
    cand = jnp.transpose(rows.reshape(rp, P3, 3, C), (0, 2, 1, 3)).reshape(
        rp, 3 * PC3)
    packed = pallas_topk4(cand, q[..., 0], q[..., 1], q[..., 2], rp)
    lane = packed & _LANE_MASK3
    win_h = jnp.take_along_axis(probes, lane // C, axis=1)
    flat_ids = table.reshape(-1, 4)[:, 3]
    ids = flat_ids[win_h * C + (lane % C)]
    valid = packed < jnp.int32(0x7F800000)
    idx = jnp.where(valid, ids, 0.0).astype(jnp.int32)
    return packed[:r], idx[:r], valid[:r]


POS_TAB = make_pos_table(table_s)


def v8b(k, b):
    q = jitter(k, b)
    packed, idx, valid = knn_rays_v8b(b["table"], b["pos_tab"], q)
    return mix(k, packed, idx)


if __name__ == "__main__":
    BIG["pos_tab"] = POS_TAB
    qj = jnp.asarray(q_ray)
    d0, i0, m0 = knn.grid_knn(index0, qj.reshape(-1, 3), k=K)
    for name, fn in (("v8", lambda: knn_rays_v8(table_s, qj)),
                     ("v8b", lambda: knn_rays_v8b(table_s, POS_TAB, qj))):
        _, i6, m6 = fn()
        i6 = np.asarray(i6).reshape(-1, K)
        m6 = np.asarray(m6).reshape(-1, K)
        w = np.asarray(points)[i6]
        qq = np.asarray(qj).reshape(-1, 1, 3)
        d6 = np.where(m6, ((w - qq) ** 2).sum(-1), np.inf)
        a = np.sort(np.asarray(d0), axis=1)
        bd = np.sort(d6, axis=1)
        ok = np.isclose(a, bd, rtol=1e-5, atol=1e-10) | ~np.isfinite(a)
        print(f"{name} dist-set match vs exact: {ok.mean()*100:.4f}%")
    chain("v7 (P=48, ids in-kernel)", v7)
    chain("v8 (epilogue ids)       ", v8)
    chain("v8b (pos-only table)    ", v8b)
    chain("v7 again                ", v7)
