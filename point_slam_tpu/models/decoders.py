"""Neural point decoders: geometry & color MLPs with Gaussian Fourier
positional embeddings and distance-weighted neighbor feature interpolation.

Pure-function/pytree re-design of the reference decoders
(src/conv_onet/models/decoder.py):

* geometry MLP — 5 blocks, hidden 32, skip concat after block 2, per-block
  feature injection ``h + fc_c[i](c)``, ReLU, sin-only learnable Fourier
  embedding (3->93, scale 25)   (decoder.py:62-222)
* color MLP — 5 blocks, hidden 128, fixed sin+cos Fourier (3->2*20, scale 32),
  Softplus(beta=100), optional relative-position neighbor encoder F_theta
  (decoder.py:225-240,341-390), optional view-direction embedding, optional
  exposure affine head (decoder.py:243-258,432-445)

The kNN itself lives outside (ops/knn.py) and its results are passed in, so
one neighbor search feeds both decoders (the reference queried FAISS twice
with identical points — decoder.py:136,347).

Weights use distributional init parity with the reference (xavier-uniform with
activation gain for Dense layers / torch-default kaiming-uniform for the
fc_c & neighbor-MLP linears); bitwise RNG parity with torch is out of scope.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

C_DIM = 32
GEO_HIDDEN = 32
COL_HIDDEN = 128
N_BLOCKS = 5
SKIP = 2
GEO_EMB = 93     # sin-only -> 93 features
COL_EMB = 20     # sin+cos -> 40 features
REL_EMB = 10     # sin+cos -> 20 features


# ---------------------------------------------------------------- init utils

def _xavier_uniform(key, in_dim, out_dim, gain):
    bound = gain * math.sqrt(6.0 / (in_dim + out_dim))
    return jax.random.uniform(key, (in_dim, out_dim), jnp.float32, -bound, bound)


def _dense_init(key, in_dim, out_dim, activation="relu"):
    """DenseLayer parity: xavier-uniform weight with activation gain, zero bias
    (decoder.py:40-49)."""
    gain = math.sqrt(2.0) if activation == "relu" else 1.0
    w = _xavier_uniform(key, in_dim, out_dim, gain)
    return {"w": w, "b": jnp.zeros((out_dim,), jnp.float32)}


def _torch_linear_init(key, in_dim, out_dim):
    """torch nn.Linear default init (kaiming-uniform a=sqrt(5) == U(+-1/sqrt(in)))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    return {"w": jax.random.uniform(kw, (in_dim, out_dim), jnp.float32, -bound, bound),
            "b": jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound)}


def _xavier_w_torch_b(key, in_dim, out_dim):
    """MLP_col_neighbor / exposure style: re-initialized weight, default bias."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    return {"w": _xavier_uniform(kw, in_dim, out_dim, 1.0),
            "b": jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound)}


def _normal_w_torch_b(key, in_dim, out_dim, std=0.01):
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    return {"w": std * jax.random.normal(kw, (in_dim, out_dim), jnp.float32),
            "b": jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound)}


def _linear(p, x, precision=None):
    """precision=None inherits the global default (run.py pins 'highest').

    The mapper/tracker relax ONLY these MLP-block matmuls via
    tpu.mlp_precision ('default' = one bf16 MXU pass instead of six f32
    passes); Fourier embeddings keep full precision — their high-frequency
    phase projections (scale 25/32) lose ~0.5 rad to bf16 rounding.
    """
    return jnp.matmul(x, p["w"], precision=precision) + p["b"]


def softplus100(x):
    """torch.nn.Softplus(beta=100) incl. the linear-above-threshold branch."""
    bx = 100.0 * x
    return jnp.where(bx > 20.0, x, jnp.log1p(jnp.exp(jnp.minimum(bx, 20.0))) / 100.0)


def fourier_embed(B, x, concat):
    """Gaussian Fourier features: sin(2*pi*x @ B) (+cos) (decoder.py:8-37)."""
    proj = (2.0 * math.pi * x) @ B
    if concat:
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
    return jnp.sin(proj)


# --------------------------------------------------------------------- init

def init_decoders(key, cfg) -> Dict[str, Any]:
    """Build the full decoder parameter pytree from a config dict."""
    c_dim = cfg["model"]["c_dim"]
    use_view_direction = cfg["model"]["use_view_direction"]
    encode_viewd = cfg["model"]["encode_viewd"]
    encode_exposure = cfg["model"]["encode_exposure"]

    keys = iter(jax.random.split(key, 64))

    def geo_block_dims():
        dims = [(GEO_EMB, GEO_HIDDEN)]
        for i in range(N_BLOCKS - 1):
            dims.append((GEO_HIDDEN + GEO_EMB if i == SKIP else GEO_HIDDEN, GEO_HIDDEN))
        return dims

    geo = {
        "embedder_B": 25.0 * jax.random.normal(next(keys), (3, GEO_EMB)),
        "pts_linears": [_dense_init(next(keys), i, o) for i, o in geo_block_dims()],
        "fc_c": [_torch_linear_init(next(keys), c_dim, GEO_HIDDEN)
                 for _ in range(N_BLOCKS)],
        "output_linear": _dense_init(next(keys), GEO_HIDDEN, 1, "relu"),
    }

    col_emb_in = 2 * COL_EMB
    if use_view_direction:
        col_emb_in += 2 * COL_EMB if encode_viewd else 3

    def col_block_dims():
        dims = [(col_emb_in, COL_HIDDEN)]
        for i in range(N_BLOCKS - 1):
            dims.append((COL_HIDDEN + col_emb_in if i == SKIP else COL_HIDDEN,
                         COL_HIDDEN))
        return dims

    col = {
        # fixed (non-learnable) embedding; stop_gradient applied in apply()
        "embedder_B": 32.0 * jax.random.normal(next(keys), (3, COL_EMB)),
        "embedder_rel_B": 32.0 * jax.random.normal(next(keys), (3, REL_EMB)),
        "mlp_col_neighbor": {
            "l1": _xavier_w_torch_b(next(keys), c_dim + 2 * REL_EMB, COL_HIDDEN),
            "l2": _xavier_w_torch_b(next(keys), COL_HIDDEN, c_dim),
        },
        "pts_linears": [_dense_init(next(keys), i, o) for i, o in col_block_dims()],
        "fc_c": [_torch_linear_init(next(keys), c_dim, COL_HIDDEN)
                 for _ in range(N_BLOCKS)],
        "output_linear": _dense_init(next(keys), COL_HIDDEN, 3, "linear"),
    }
    if use_view_direction and encode_viewd:
        col["embedder_view_B"] = 32.0 * jax.random.normal(next(keys), (3, COL_EMB))
    if encode_exposure:
        col["mlp_exposure"] = {
            "l1": _normal_w_torch_b(next(keys), cfg["model"]["exposure_dim"], COL_HIDDEN),
            "l2": _normal_w_torch_b(next(keys), COL_HIDDEN, 12),
        }
    return {"geo": geo, "col": col}


def load_pretrained_geo(params: Dict[str, Any], path: str) -> Dict[str, Any]:
    """Load a converted NICE-SLAM 'middle' decoder into the geometry MLP.

    The reference warm-starts geo_decoder from pretrained/middle_fine.pt
    (src/Point_SLAM.py:143-164, strict=False — only matching MLP keys load).
    We accept an .npz produced by tools/convert_pretrained.py with arrays
    named pts_linears.{i}.{weight,bias}, fc_c.{i}.{weight,bias},
    output_linear.{weight,bias}. Missing file -> params returned unchanged.
    """
    import os
    if not path or not os.path.exists(path):
        return params
    data = dict(np.load(path))
    geo = jax.tree_util.tree_map(lambda x: x, params["geo"])  # deep-ish copy

    def put(dst, name):
        w = data.get(f"{name}.weight")
        b = data.get(f"{name}.bias")
        if w is not None and w.T.shape == dst["w"].shape:
            dst["w"] = jnp.asarray(w.T)
        if b is not None and b.shape == dst["b"].shape:
            dst["b"] = jnp.asarray(b)

    data = dict(data)
    for i in range(N_BLOCKS):
        put(geo["pts_linears"][i], f"pts_linears.{i}")
        put(geo["fc_c"][i], f"fc_c.{i}")
    put(geo["output_linear"], "output_linear")
    if "embedder._B" in data and data["embedder._B"].shape == (3, GEO_EMB):
        geo["embedder_B"] = jnp.asarray(data["embedder._B"])
    out = dict(params)
    out["geo"] = geo
    return out


# ------------------------------------------------------- feature interpolation

def interpolation_weights(dists, valid, radius_bound, weighting="distance"):
    """Per-neighbor interpolation weights (decoder.py:152-160).

    dists: (N,K) squared L2 (+inf for invalid slots); radius_bound: (N,) radius
    (NOT squared); returns L1-normalized weights with zero weight outside the
    query ball.
    """
    if weighting == "distance":
        w = 1.0 / (dists + 1e-10)
    else:  # 'expo'
        w = jnp.exp(-20.0 * jnp.sqrt(dists))
    bound2 = jnp.asarray(radius_bound, jnp.float32).reshape(-1, 1) ** 2
    w = jnp.where((dists > bound2) | (~valid), 0.0, w)
    norm = jnp.maximum(jnp.sum(jnp.abs(w), axis=1, keepdims=True), 1e-12)
    return w / norm


def interpolate_features(feats, idx, weights):
    """(CAP,c) gathered at (N,K) idx, weighted-summed -> (N,c)."""
    neigh = feats[idx]                       # (N,K,c)
    return jnp.sum(weights[..., None] * neigh, axis=1)


# ---------------------------------------------------------------- MLP applies

def _mlp_forward(pts_linears, fc_c, emb, c, act, precision=None):
    h = emb
    for i in range(N_BLOCKS):
        h = act(_linear(pts_linears[i], h, precision))
        h = h + _linear(fc_c[i], c, precision)
        if i == SKIP:
            h = jnp.concatenate([emb, h], axis=-1)
    return h


def geo_decoder_apply(geo_params, p, c, precision=None):
    """Occupancy logits for points p given interpolated features c. (N,)"""
    emb = fourier_embed(geo_params["embedder_B"], p, concat=False)
    h = _mlp_forward(geo_params["pts_linears"], geo_params["fc_c"], emb, c,
                     jax.nn.relu, precision)
    return _linear(geo_params["output_linear"], h, precision)[..., 0]


def col_decoder_apply(col_params, p, c, views_d=None, exposure_feat=None,
                      apply_sigmoid=True, precision=None):
    """RGB for points p. Mirrors MLP_color.forward (decoder.py:392-449)."""
    emb = fourier_embed(jax.lax.stop_gradient(col_params["embedder_B"]), p,
                        concat=True)
    if views_d is not None:
        vnorm = views_d / jnp.maximum(
            jnp.linalg.norm(views_d, axis=-1, keepdims=True), 1e-12)
        if "embedder_view_B" in col_params:
            vemb = fourier_embed(jax.lax.stop_gradient(col_params["embedder_view_B"]),
                                 vnorm, concat=True)
        else:
            vemb = vnorm
        emb = jnp.concatenate([emb, vemb], axis=-1)
    h = _mlp_forward(col_params["pts_linears"], col_params["fc_c"], emb, c,
                     softplus100, precision)
    out = _linear(col_params["output_linear"], h, precision)
    if exposure_feat is not None:
        rot, trans = exposure_affine(col_params, exposure_feat)
        out = out @ rot + trans
        return jax.nn.sigmoid(out)
    return jax.nn.sigmoid(out) if apply_sigmoid else out


def exposure_affine(col_params, exposure_feat):
    """Exposure latent -> (3x3 rot, 3 trans) affine (decoder.py:243-258)."""
    mp = col_params["mlp_exposure"]
    h = softplus100(_linear(mp["l1"], exposure_feat))
    aff = _linear(mp["l2"], h)
    return aff[..., :9].reshape(*aff.shape[:-1], 3, 3), aff[..., 9:]


def encode_neighbor_feats(col_params, neighbor_pos, p, neighbor_feats,
                          precision=None):
    """F_theta relative-position encoding of neighbor features
    (decoder.py:373-381): (N,K,c) -> (N,K,c)."""
    rel = neighbor_pos - p[:, None, :]
    emb = fourier_embed(col_params["embedder_rel_B"],
                        rel.reshape(-1, 3), concat=True)
    emb = emb.reshape(neighbor_pos.shape[0], -1, 2 * REL_EMB)
    x = jnp.concatenate([emb, neighbor_feats], axis=-1)
    mp = col_params["mlp_col_neighbor"]
    return _linear(mp["l2"], softplus100(_linear(mp["l1"], x, precision)),
                   precision)


def random_fill_features(key, c, has_neighbors, c_dim):
    """Points lacking neighbors get one shared random N(0,0.01) vector
    (decoder.py:170-173 — a single sampled vector assigned to all masked rows)."""
    rnd = 0.01 * jax.random.normal(key, (c_dim,), c.dtype)
    return jnp.where(has_neighbors[:, None], c, rnd[None, :])
