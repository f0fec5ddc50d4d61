"""kNN input-layout experiment: the production ray_grid_knn pipeline pays
~1.3 ms/iter in pure layout copies (xprof: %copy f32[5024,4,36,64] +
f32[5024,9216]) between the cell-table gather and the Pallas kernel.

Variants measured end-to-end (probes -> candidate fetch -> top-k kernel):
  A. current: (T+1,C,4) table, gather (R,P,C,4), transpose to planes
  B. component-major table (4,T+1,C): one gather (4,R,P,C), no transpose,
     kernel takes the 4-plane block directly
  C. four separate plane tables (T+1,C) each: 4 gathers, kernel takes 4 refs
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from point_slam_tpu.ops import knn
from point_slam_tpu.ops.knn import (_RAY_BLK, _P_RAY_DEFAULT as _P_RAY, _box_probes,
                                    _ray_topk_kernel)

T = 1 << 16
C = 64
R = 5024
NS = 5
K = 8
REP = 30

rng = np.random.default_rng(0)
NPTS = 300_000
pts = np.stack([rng.uniform(-2.5, 2.5, NPTS), rng.uniform(-2.5, 2.5, NPTS),
                -2.0 + 0.3 * rng.standard_normal(NPTS)], -1).astype(np.float32)
cell = 0.16
index = knn.build_grid_index(jnp.asarray(pts), jnp.asarray(NPTS),
                             jnp.asarray(cell, jnp.float32), T, C)

# ray queries: cluster ns samples around surface points
base = pts[rng.integers(0, NPTS, R)]
qs = base[:, None, :] + rng.normal(0, 0.01, (R, NS, 3)).astype(np.float32)
q = jnp.asarray(qs)

pc_ = _P_RAY * C
lane_mask = (1 << (pc_ - 1).bit_length()) - 1

table = index.table                       # (T+1, C, 4)
table_cm = jnp.transpose(table, (2, 0, 1))  # (4, T+1, C)
planes = tuple(table[..., i] for i in range(4))  # 4 x (T+1, C)


def chain(name, step, *args):
    @jax.jit
    def run(key, a):
        def body(i, k):
            out = step(k, a)
            return jax.random.fold_in(k, (out * 0.0).astype(jnp.int32) + 1)
        return jax.lax.fori_loop(0, REP, body, key)
    k0 = jax.random.key(0)
    t0 = time.time()
    float(jax.random.key_data(run(k0, args))[0])
    ct = time.time() - t0
    t0 = time.time()
    float(jax.random.key_data(run(k0, args))[0])
    dt = (time.time() - t0) / REP
    print(f"{name}: {dt*1e3:7.3f} ms  (compile {ct:.0f}s)", flush=True)
    return dt


def jitter(key, qq):
    # fresh query values each rep so nothing is hoisted out of the loop
    return qq + jax.random.uniform(key, (1, 1, 3), jnp.float32, 0, 1e-4)


def run_kernel_planes(cand, qj, specs_c):
    bs_q = pl.BlockSpec((_RAY_BLK, NS), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    bs_o = pl.BlockSpec((_RAY_BLK, NS * K), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    packed, ids = pl.pallas_call(
        _ray_topk_kernel(NS, K, pc_, lane_mask),
        grid=(R // _RAY_BLK,),
        in_specs=[specs_c, bs_q, bs_q, bs_q],
        out_specs=(bs_o, bs_o),
        out_shape=(jax.ShapeDtypeStruct((R, NS * K), jnp.int32),
                   jax.ShapeDtypeStruct((R, NS * K), jnp.float32)),
        interpret=jax.default_backend() == "cpu",
    )(cand, qj[..., 0], qj[..., 1], qj[..., 2])
    return jnp.sum(packed[:64].astype(jnp.float32))


def variant_a(key, a):
    qj = jitter(key, q)
    probes, compact = _box_probes(qj, index.cell_size, T, _P_RAY)
    blocks = a[0][probes]                                  # (R,P,C,4)
    cand = jnp.transpose(blocks, (0, 3, 1, 2)).reshape(R, 4 * pc_)
    bs_c = pl.BlockSpec((_RAY_BLK, 4 * pc_), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return run_kernel_planes(cand, qj, bs_c)


def _kernel4(ns, k, pcw, lm):
    def kernel(cand_ref, qx_ref, qy_ref, qz_ref, out_p_ref, out_i_ref):
        X = cand_ref[0].reshape(_RAY_BLK, pcw)
        Y = cand_ref[1].reshape(_RAY_BLK, pcw)
        Z = cand_ref[2].reshape(_RAY_BLK, pcw)
        ids = cand_ref[3].reshape(_RAY_BLK, pcw)
        lane = jax.lax.broadcasted_iota(jnp.int32, X.shape, 1)
        for s in range(ns):
            dx = X - qx_ref[:, s][:, None]
            dy = Y - qy_ref[:, s][:, None]
            dz = Z - qz_ref[:, s][:, None]
            d2 = dx * dx + dy * dy + dz * dz
            packed = ((jax.lax.bitcast_convert_type(d2, jnp.int32)
                       & ~jnp.int32(lm)) | lane)
            for kk in range(k):
                m = jnp.min(packed, axis=-1, keepdims=True)
                sel = lane == (m & lm)
                out_p_ref[:, s * k + kk] = m[:, 0]
                out_i_ref[:, s * k + kk] = jnp.sum(
                    jnp.where(sel, ids, 0.0), axis=-1)
                packed = jnp.where(sel, jnp.int32(0x7FFFFFFF), packed)
    return kernel


def variant_b(key, a):
    qj = jitter(key, q)
    probes, compact = _box_probes(qj, index.cell_size, T, _P_RAY)
    blocks = a[0][:, probes]                               # (4,R,P,C)
    cand = blocks.reshape(4, R, pc_)
    bs_c = pl.BlockSpec((4, _RAY_BLK, pc_), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    bs_q = pl.BlockSpec((_RAY_BLK, NS), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    bs_o = pl.BlockSpec((_RAY_BLK, NS * K), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    packed, ids = pl.pallas_call(
        _kernel4(NS, K, pc_, lane_mask),
        grid=(R // _RAY_BLK,),
        in_specs=[bs_c, bs_q, bs_q, bs_q],
        out_specs=(bs_o, bs_o),
        out_shape=(jax.ShapeDtypeStruct((R, NS * K), jnp.int32),
                   jax.ShapeDtypeStruct((R, NS * K), jnp.float32)),
        interpret=jax.default_backend() == "cpu",
    )(cand, qj[..., 0], qj[..., 1], qj[..., 2])
    return jnp.sum(packed[:64].astype(jnp.float32))


def _kernel_sep(ns, k, pcw, lm):
    def kernel(x_ref, y_ref, z_ref, id_ref, qx_ref, qy_ref, qz_ref,
               out_p_ref, out_i_ref):
        X, Y, Z, ids = x_ref[...], y_ref[...], z_ref[...], id_ref[...]
        lane = jax.lax.broadcasted_iota(jnp.int32, X.shape, 1)
        for s in range(ns):
            dx = X - qx_ref[:, s][:, None]
            dy = Y - qy_ref[:, s][:, None]
            dz = Z - qz_ref[:, s][:, None]
            d2 = dx * dx + dy * dy + dz * dz
            packed = ((jax.lax.bitcast_convert_type(d2, jnp.int32)
                       & ~jnp.int32(lm)) | lane)
            for kk in range(k):
                m = jnp.min(packed, axis=-1, keepdims=True)
                sel = lane == (m & lm)
                out_p_ref[:, s * k + kk] = m[:, 0]
                out_i_ref[:, s * k + kk] = jnp.sum(
                    jnp.where(sel, ids, 0.0), axis=-1)
                packed = jnp.where(sel, jnp.int32(0x7FFFFFFF), packed)
    return kernel


def variant_c(key, a):
    qj = jitter(key, q)
    probes, compact = _box_probes(qj, index.cell_size, T, _P_RAY)
    px, py, pz, pid = (t[probes].reshape(R, pc_) for t in a)
    bs_c = pl.BlockSpec((_RAY_BLK, pc_), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    bs_q = pl.BlockSpec((_RAY_BLK, NS), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    bs_o = pl.BlockSpec((_RAY_BLK, NS * K), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    packed, ids = pl.pallas_call(
        _kernel_sep(NS, K, pc_, lane_mask),
        grid=(R // _RAY_BLK,),
        in_specs=[bs_c] * 4 + [bs_q] * 3,
        out_specs=(bs_o, bs_o),
        out_shape=(jax.ShapeDtypeStruct((R, NS * K), jnp.int32),
                   jax.ShapeDtypeStruct((R, NS * K), jnp.float32)),
        interpret=jax.default_backend() == "cpu",
    )(px, py, pz, pid, qj[..., 0], qj[..., 1], qj[..., 2])
    return jnp.sum(packed[:64].astype(jnp.float32))


ta = chain("A current  (gather+transpose)", variant_a, table)
tb = chain("B comp-major single gather   ", variant_b, table_cm)
tc = chain("C four plane tables          ", variant_c, *planes)
print(f"\nA {ta*1e3:.2f} | B {tb*1e3:.2f} | C {tc*1e3:.2f} ms "
      f"(x2 per color iter: fwd in grad + recompute)")
