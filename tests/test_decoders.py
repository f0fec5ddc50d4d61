import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from point_slam_tpu.models import decoders as D


def base_cfg(**model_over):
    model = {"c_dim": 32, "exposure_dim": 8, "pos_embedding_method": "fourier",
             "encode_rel_pos_in_col": True, "encode_exposure": False,
             "use_view_direction": False, "encode_viewd": True}
    model.update(model_over)
    return {"model": model}


def torch_geo_forward(params, p, c):
    """Oracle: the reference geometry MLP math (decoder.py:203-218) rebuilt in
    torch from our parameter values."""
    g = params["geo"]
    emb = torch.sin(2 * np.pi * torch.from_numpy(p) @ torch.from_numpy(
        np.asarray(g["embedder_B"])))
    h = emb
    c = torch.from_numpy(c)
    for i in range(5):
        w = torch.from_numpy(np.asarray(g["pts_linears"][i]["w"]))
        b = torch.from_numpy(np.asarray(g["pts_linears"][i]["b"]))
        h = F.relu(h @ w + b)
        wc = torch.from_numpy(np.asarray(g["fc_c"][i]["w"]))
        bc = torch.from_numpy(np.asarray(g["fc_c"][i]["b"]))
        h = h + (c @ wc + bc)
        if i == 2:
            h = torch.cat([emb, h], -1)
    wo = torch.from_numpy(np.asarray(g["output_linear"]["w"]))
    bo = torch.from_numpy(np.asarray(g["output_linear"]["b"]))
    return (h @ wo + bo)[:, 0]


def torch_col_forward(params, p, c):
    """Oracle for the color MLP (decoder.py:411-431, softplus beta=100)."""
    g = params["col"]
    act = torch.nn.Softplus(beta=100)
    proj = 2 * np.pi * torch.from_numpy(p) @ torch.from_numpy(
        np.asarray(g["embedder_B"]))
    emb = torch.cat([torch.sin(proj), torch.cos(proj)], -1)
    h = emb
    c = torch.from_numpy(c)
    for i in range(5):
        w = torch.from_numpy(np.asarray(g["pts_linears"][i]["w"]))
        b = torch.from_numpy(np.asarray(g["pts_linears"][i]["b"]))
        h = act(h @ w + b)
        wc = torch.from_numpy(np.asarray(g["fc_c"][i]["w"]))
        bc = torch.from_numpy(np.asarray(g["fc_c"][i]["b"]))
        h = h + (c @ wc + bc)
        if i == 2:
            h = torch.cat([emb, h], -1)
    wo = torch.from_numpy(np.asarray(g["output_linear"]["w"]))
    bo = torch.from_numpy(np.asarray(g["output_linear"]["b"]))
    return torch.sigmoid(h @ wo + bo)


def test_geo_decoder_matches_reference_math():
    params = D.init_decoders(jax.random.key(0), base_cfg())
    rng = np.random.default_rng(0)
    p = rng.uniform(-2, 2, (64, 3)).astype(np.float32)
    c = rng.normal(size=(64, 32)).astype(np.float32)
    ours = np.asarray(D.geo_decoder_apply(params["geo"], jnp.asarray(p),
                                          jnp.asarray(c)))
    ref = torch_geo_forward(params, p, c).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_col_decoder_matches_reference_math():
    params = D.init_decoders(jax.random.key(1), base_cfg())
    rng = np.random.default_rng(1)
    p = rng.uniform(-2, 2, (32, 3)).astype(np.float32)
    c = rng.normal(size=(32, 32)).astype(np.float32)
    ours = np.asarray(D.col_decoder_apply(params["col"], jnp.asarray(p),
                                          jnp.asarray(c)))
    ref = torch_col_forward(params, p, c).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_softplus100_matches_torch():
    x = np.linspace(-1, 1, 1001).astype(np.float32)
    ours = np.asarray(D.softplus100(jnp.asarray(x)))
    ref = torch.nn.Softplus(beta=100)(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_interpolation_weights_semantics():
    # inverse-squared-distance, zero outside radius, L1 normalized
    d = jnp.asarray([[0.01, 0.04, 1.0, jnp.inf]])
    valid = jnp.asarray([[True, True, True, False]])
    w = np.asarray(D.interpolation_weights(d, valid, jnp.asarray([0.5]),
                                           "distance"))
    assert w[0, 2] == 0.0 and w[0, 3] == 0.0  # outside radius / invalid
    assert abs(w.sum() - 1.0) < 1e-6
    assert w[0, 0] > w[0, 1]
    # torch parity of the weighting itself
    dt = torch.tensor([[0.01, 0.04, 1.0, float("inf")]])
    wt = 1.0 / (dt + 1e-10)
    wt[dt > 0.25] = 0.0
    wt = F.normalize(wt, p=1, dim=1).numpy()
    np.testing.assert_allclose(w, wt, atol=1e-6)


def test_expo_weighting():
    d = jnp.asarray([[0.01, 0.04, jnp.inf, jnp.inf]])
    valid = jnp.asarray([[True, True, False, False]])
    w = np.asarray(D.interpolation_weights(d, valid, jnp.asarray([1.0]), "expo"))
    ref = np.exp(-20 * np.sqrt([0.01, 0.04]))
    ref = ref / ref.sum()
    np.testing.assert_allclose(w[0, :2], ref, rtol=1e-5)
    assert not np.isnan(w).any()


def test_random_fill_shared_vector():
    c = jnp.zeros((5, 32))
    has = jnp.asarray([True, False, False, True, False])
    out = np.asarray(D.random_fill_features(jax.random.key(0), c, has, 32))
    assert np.allclose(out[0], 0) and np.allclose(out[3], 0)
    # all masked rows share one random vector (decoder.py:170-173)
    np.testing.assert_array_equal(out[1], out[2])
    np.testing.assert_array_equal(out[1], out[4])
    assert np.abs(out[1]).max() < 0.1


def test_exposure_affine_shapes():
    cfg = base_cfg(encode_exposure=True)
    params = D.init_decoders(jax.random.key(2), cfg)
    rot, trans = D.exposure_affine(params["col"], jnp.zeros(8))
    assert rot.shape == (3, 3) and trans.shape == (3,)


def test_view_direction_path():
    cfg = base_cfg(use_view_direction=True, encode_viewd=True)
    params = D.init_decoders(jax.random.key(3), cfg)
    p = jnp.zeros((4, 3))
    c = jnp.zeros((4, 32))
    v = jnp.asarray(np.random.default_rng(0).normal(size=(4, 3)), jnp.float32)
    out = D.col_decoder_apply(params["col"], p, c, views_d=v)
    assert out.shape == (4, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_encode_neighbor_feats_shape():
    params = D.init_decoders(jax.random.key(4), base_cfg())
    rng = np.random.default_rng(5)
    npos = jnp.asarray(rng.normal(size=(10, 8, 3)), jnp.float32)
    p = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
    nf = jnp.asarray(rng.normal(size=(10, 8, 32)), jnp.float32)
    out = D.encode_neighbor_feats(params["col"], npos, p, nf)
    assert out.shape == (10, 8, 32)


def test_pretrain_geo_npz_roundtrip(tmp_path):
    """save_geo_npz (tools/pretrain_geo) -> load_pretrained_geo restores the
    geometry decoder bit-exactly, INCLUDING the Fourier embedder matrix the
    MLP weights are tied to."""
    from point_slam_tpu.tools.pretrain_geo import save_geo_npz

    src = D.init_decoders(jax.random.key(11), base_cfg())
    path = str(tmp_path / "geo.npz")
    n = save_geo_npz(src["geo"], path)
    n_lin = len(src["geo"]["pts_linears"]) + len(src["geo"]["fc_c"]) + 1
    assert n == 2 * n_lin + 1  # weights+biases + embedder._B

    dst = D.init_decoders(jax.random.key(99), base_cfg())  # different init
    loaded = D.load_pretrained_geo(dst, path)
    for a, b in zip(jax.tree_util.tree_leaves(loaded["geo"]),
                    jax.tree_util.tree_leaves(src["geo"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # color decoder untouched
    for a, b in zip(jax.tree_util.tree_leaves(loaded["col"]),
                    jax.tree_util.tree_leaves(dst["col"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
