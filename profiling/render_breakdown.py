"""Sub-ladder inside render_rays: where do 17 ms of geometry forward go?"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from point_slam_tpu.models import decoders as D
from point_slam_tpu.ops import knn

CAP = 1 << 19
NPTS = 300_000
R = 5000
NS = 5
Q = R * NS
CELL = 0.16
TABLE = 1 << 16
C = 96
K = 8

rng = np.random.default_rng(0)
u = rng.uniform(0, 6, (NPTS, 2)).astype(np.float32)
pts = np.stack([u[:, 0], u[:, 1], 2.0 + 0.3 * np.sin(u[:, 0] * 3)], -1
               ).astype(np.float32)
pos = np.full((CAP, 3), 1e6, np.float32)
pos[:NPTS] = pts
BIG = dict(
    pos=jnp.asarray(pos),
    geo_feats=jnp.asarray(0.1 * rng.standard_normal((CAP, 32)), jnp.float32),
    col_feats=jnp.asarray(0.1 * rng.standard_normal((CAP, 32)), jnp.float32),
    index=knn.build_grid_index(jnp.asarray(pos), jnp.asarray(NPTS),
                               jnp.asarray(CELL), TABLE, C),
    params=D.init_decoders(jax.random.key(0),
                           {"model": {"c_dim": 32, "use_view_direction": False,
                                      "encode_viewd": False,
                                      "encode_exposure": False,
                                      "exposure_dim": 8}}),
)
N = 30


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


def mix(k, x):
    return jax.random.fold_in(k, (jnp.sum(x) * 0.0).astype(jnp.int32) + 1)


def queries(k):
    i = jax.random.randint(k, (Q,), 0, NPTS)
    return BIG["pos"][0] * 0.0 + jnp.zeros(3)  # placeholder


def make_queries(k, b):
    idx = jax.random.randint(k, (Q,), 0, NPTS)
    return b["pos"][idx] + 0.02 * jax.random.normal(k, (Q, 3))


def s_q(k, b):
    return mix(k, make_queries(k, b))


def s_knn(k, b):
    p = make_queries(k, b)
    d, i, v = knn.grid_knn(b["index"], p, k=K)
    return mix(k, jnp.where(jnp.isfinite(d), d, 0.0))


def s_interp(k, b):
    p = make_queries(k, b)
    d, i, v = knn.grid_knn(b["index"], p, k=K)
    rq = jnp.full((Q,), 0.16)
    w = D.interpolation_weights(d, v, rq, "distance")
    c_geo = D.interpolate_features(b["geo_feats"], i, w)
    return mix(k, c_geo)


def s_geo(k, b):
    p = make_queries(k, b)
    d, i, v = knn.grid_knn(b["index"], p, k=K)
    rq = jnp.full((Q,), 0.16)
    w = D.interpolation_weights(d, v, rq, "distance")
    c_geo = D.interpolate_features(b["geo_feats"], i, w)
    occ = D.geo_decoder_apply(b["params"]["geo"], p, c_geo)
    return mix(k, occ)


def s_col_extras(k, b):
    p = make_queries(k, b)
    d, i, v = knn.grid_knn(b["index"], p, k=K)
    rq = jnp.full((Q,), 0.16)
    w = D.interpolation_weights(d, v, rq, "distance")
    neigh_feats = b["col_feats"][i]
    neigh_pos = b["pos"][i]
    nf = D.encode_neighbor_feats(b["params"]["col"], neigh_pos, p, neigh_feats)
    c_col = jnp.sum(w[..., None] * nf, axis=1)
    rgb = D.col_decoder_apply(b["params"]["col"], p, c_col)
    return mix(k, rgb)


t0_ = chain("0 make queries       ", s_q)
t1 = chain("1 + grid_knn (new id)", s_knn)
t2 = chain("2 + geo interp       ", s_interp)
t3 = chain("3 + geo MLP          ", s_geo)
t4 = chain("4 col path (knn+rel) ", s_col_extras)
print(f"\nknn {1e3*(t1-t0_):.1f} | geo feat gather+interp {1e3*(t2-t1):.1f} | "
      f"geo MLP {1e3*(t3-t2):.1f} | col gathers+MLPs {1e3*(t4-t1):.1f}")
