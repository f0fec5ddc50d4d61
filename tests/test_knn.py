import numpy as np
import jax.numpy as jnp

from point_slam_tpu.ops import knn


def make_cloud(n, cap, seed=0, scale=2.0):
    rng = np.random.default_rng(seed)
    pts = np.zeros((cap, 3), np.float32)
    pts[:n] = rng.uniform(-scale, scale, size=(n, 3)).astype(np.float32)
    # junk in the padding region must never be returned
    pts[n:] = 1e6
    return pts, rng


def numpy_knn(pts, n, queries, k):
    d = ((queries[:, None, :] - pts[None, :n, :]) ** 2).sum(-1)
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    dd = np.take_along_axis(d, idx, axis=1)
    if n < k:
        pad = k - n
        dd = np.concatenate([dd, np.full((len(queries), pad), np.inf)], 1)
        idx = np.concatenate([idx, np.zeros((len(queries), pad), int)], 1)
    return dd, idx


def test_brute_knn_exact():
    cap, n, q = 512, 300, 64
    pts, rng = make_cloud(n, cap, seed=1)
    queries = rng.uniform(-2, 2, size=(q, 3)).astype(np.float32)
    d, i, v = knn.brute_knn(jnp.asarray(pts), jnp.asarray(n), jnp.asarray(queries),
                            k=8, tile=128)
    rd, ri = numpy_knn(pts, n, queries, 8)
    np.testing.assert_allclose(np.asarray(d), rd, rtol=1e-4, atol=1e-5)
    assert np.all(np.asarray(v))
    # indices can differ on exact ties; compare distances at returned indices
    chk = ((queries[:, None, :] - pts[np.asarray(i)]) ** 2).sum(-1)
    np.testing.assert_allclose(chk, rd, rtol=1e-4, atol=1e-5)


def test_brute_knn_fewer_points_than_k():
    cap, n, q = 64, 3, 8
    pts, rng = make_cloud(n, cap, seed=2)
    queries = rng.uniform(-2, 2, size=(q, 3)).astype(np.float32)
    d, i, v = knn.brute_knn(jnp.asarray(pts), jnp.asarray(n), jnp.asarray(queries), k=8)
    assert np.all(np.asarray(v)[:, :3])
    assert not np.any(np.asarray(v)[:, 3:])
    assert np.all(np.isinf(np.asarray(d)[:, 3:]))


def test_grid_knn_matches_brute_within_radius():
    """Grid search must recover every in-radius neighbor the oracle finds."""
    cap, n, q = 2048, 1500, 256
    radius = 0.25
    pts, rng = make_cloud(n, cap, seed=3)
    queries = (pts[rng.integers(0, n, size=q)] +
               rng.normal(scale=0.08, size=(q, 3)).astype(np.float32))
    idx = knn.build_grid_index(jnp.asarray(pts), jnp.asarray(n),
                               jnp.asarray(radius), table_size=1 << 14)
    gd, gi, gv = knn.grid_knn(idx, jnp.asarray(queries), k=8)
    rd, ri = numpy_knn(pts, n, queries, 8)
    gd, gv = np.asarray(gd), np.asarray(gv)
    # wherever the oracle's k-th neighbor is within the radius, grid must agree
    in_radius = rd < radius ** 2
    np.testing.assert_allclose(np.where(in_radius, gd, 0.0),
                               np.where(in_radius, rd, 0.0),
                               rtol=1e-4, atol=1e-5)
    # counts within radius agree
    gc = np.asarray(knn.neighbor_count(jnp.asarray(gd), jnp.asarray(gv),
                                       jnp.asarray(radius)))
    rc = in_radius.sum(1)
    np.testing.assert_array_equal(gc, rc)
    # returned point IDS must be real neighbors: the distance recomputed from
    # the id'd point must equal the reported distance (guards against id
    # channel corruption, e.g. the denormal-flush bitcast bug)
    gi = np.asarray(gi)
    recomputed = ((queries[:, None, :] - pts[gi]) ** 2).sum(-1)
    np.testing.assert_allclose(np.where(in_radius, recomputed, 0.0),
                               np.where(in_radius, gd, 0.0),
                               rtol=1e-4, atol=1e-5)
    # and the in-radius id SET matches the oracle's
    for r_ in range(0, q, 17):
        n_in = int(rc[r_])
        assert set(gi[r_, :n_in]) == set(ri[r_, :n_in]), r_


def test_grid_knn_per_query_radius_counts():
    cap, n, q = 1024, 700, 128
    pts, rng = make_cloud(n, cap, seed=4)
    queries = pts[:q] + rng.normal(scale=0.02, size=(q, 3)).astype(np.float32)
    radii = rng.uniform(0.02, 0.2, size=q).astype(np.float32)
    idx = knn.build_grid_index(jnp.asarray(pts), jnp.asarray(n), jnp.asarray(0.2))
    gd, gi, gv = knn.grid_knn(idx, jnp.asarray(queries), k=8)
    counts = np.asarray(knn.neighbor_count(jnp.asarray(gd), jnp.asarray(gv),
                                           jnp.asarray(radii)))
    rd, _ = numpy_knn(pts, n, queries, 8)
    ref_counts = (rd < radii[:, None] ** 2).sum(1)
    np.testing.assert_array_equal(counts, ref_counts)


def test_build_grid_index_plane_consistency():
    """The component planes must stay mutually consistent: every valid
    point id appears exactly once, and its (px,py,pz) slots hold that
    point's coordinates; the sentinel row is all +inf."""
    cap, n = 1024, 700
    pts, rng = make_cloud(n, cap, seed=7)
    idx = knn.build_grid_index(jnp.asarray(pts), jnp.asarray(n),
                               jnp.asarray(0.15))
    px, py, pz, pid = (np.asarray(idx.px), np.asarray(idx.py),
                       np.asarray(idx.pz), np.asarray(idx.pid))
    fin = np.isfinite(pid)
    ids = pid[fin].astype(np.int64)
    assert sorted(ids.tolist()) == list(range(n))
    np.testing.assert_array_equal(px[fin], pts[ids, 0])
    np.testing.assert_array_equal(py[fin], pts[ids, 1])
    np.testing.assert_array_equal(pz[fin], pts[ids, 2])
    for plane in (px, py, pz):
        assert not np.any(np.isfinite(plane[~fin]))
        assert not np.any(np.isfinite(plane[-1]))


def test_grid_knn_empty_cloud():
    cap = 128
    pts = np.full((cap, 3), 1e6, np.float32)
    queries = np.zeros((4, 3), np.float32)
    idx = knn.build_grid_index(jnp.asarray(pts), jnp.asarray(0), jnp.asarray(0.1))
    gd, gi, gv = knn.grid_knn(idx, jnp.asarray(queries), k=8)
    assert not np.any(np.asarray(gv))
    assert np.all(np.isinf(np.asarray(gd)))


def _ray_queries(pts, n, rng, n_rays, ns=5):
    """Ray-structured queries: samples clustered within 0.04*depth."""
    centers = pts[rng.integers(0, n, size=n_rays)]
    dirs = rng.normal(size=(n_rays, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    depth = rng.uniform(1.5, 4.0, size=n_rays).astype(np.float32)
    t = np.linspace(0.98, 1.02, ns).astype(np.float32)
    origins = centers - dirs * depth[:, None]
    z = depth[:, None] * t[None, :]
    return (origins[:, None, :] + dirs[:, None, :] * z[..., None]
            ).astype(np.float32)


def test_ray_grid_knn_matches_grid_knn():
    """Ray-shared (Pallas) search agrees with per-sample grid_knn on
    compact rays: same in-radius neighbor sets, counts, and recomputed
    distances (ray path distances are selection-quantized, so compare via
    winner coordinates)."""
    cap, n, n_rays, ns = 4096, 3000, 64, 5
    radius = 0.2
    pts, rng = make_cloud(n, cap, seed=5)
    q = _ray_queries(pts, n, rng, n_rays, ns)
    index = knn.build_grid_index(jnp.asarray(pts), jnp.asarray(n),
                                 jnp.asarray(radius), table_size=1 << 14)
    gd, gi, gv = knn.grid_knn(index, jnp.asarray(q.reshape(-1, 3)), k=8)
    rd, ri, rv, compact = knn.ray_grid_knn(index, jnp.asarray(q), k=8)
    assert np.all(np.asarray(compact))
    gd, gv, gi = np.asarray(gd), np.asarray(gv), np.asarray(gi)
    ri, rv = np.asarray(ri), np.asarray(rv)
    flat_q = q.reshape(-1, 3)
    re_d = ((flat_q[:, None, :] - pts[ri]) ** 2).sum(-1)
    re_d = np.where(rv, re_d, np.inf)
    # the ray path's box covers MORE cells than one sample's 27 (the union
    # over the ray), so it may return extra beyond-radius neighbors; only
    # in-radius behavior is contractual (weights are zero outside radius).
    g_sorted = np.sort(np.where(gv, gd, np.inf), axis=1)
    r_sorted = np.sort(re_d, axis=1)
    r2 = radius ** 2
    in_r = g_sorted < r2
    np.testing.assert_allclose(np.where(in_r, g_sorted, 0.0),
                               np.where(in_r, r_sorted, 0.0),
                               rtol=1e-5, atol=1e-9)
    # in-radius counts agree exactly (this is what neighbor_count consumes)
    np.testing.assert_array_equal((g_sorted < r2).sum(1),
                                  (r_sorted < r2).sum(1))
    # quantized selection distances track the exact ones loosely
    rdq = np.asarray(rd)
    fin = np.isfinite(rdq)
    np.testing.assert_allclose(rdq[fin], re_d[fin], rtol=2e-3, atol=1e-6)


def test_ray_grid_knn_flags_wide_rays_non_compact():
    """Rays whose samples span more cells than the probe box must be
    flagged so the renderer can fall back to per-sample search."""
    cap, n = 1024, 700
    pts, rng = make_cloud(n, cap, seed=6)
    index = knn.build_grid_index(jnp.asarray(pts), jnp.asarray(n),
                                 jnp.asarray(0.1), table_size=1 << 12)
    # uniform samples over meters (a depth-free ray)
    q = np.zeros((2, 5, 3), np.float32)
    q[0, :, 0] = np.linspace(-1.5, 1.5, 5)          # spans 30 cells
    q[1] = 0.01 * rng.normal(size=(5, 3))           # compact
    _, _, _, compact = knn.ray_grid_knn(index, jnp.asarray(q), k=8)
    assert not bool(compact[0])
    assert bool(compact[1])


def test_grid_knn_subset_matches_grid_knn():
    """The chunked subset fallback returns bit-identical grid_knn results on
    needed rays (including multi-chunk sweeps) and zeros elsewhere."""
    cap, n, n_rays, ns = 4096, 3000, 40, 5
    pts, rng = make_cloud(n, cap, seed=7)
    q = _ray_queries(pts, n, rng, n_rays, ns)
    index = knn.build_grid_index(jnp.asarray(pts), jnp.asarray(n),
                                 jnp.asarray(0.2), table_size=1 << 14)
    need = rng.random(n_rays) < 0.4
    need[0] = True                                   # ensure non-empty
    gd, gi, gv = knn.grid_knn(index, jnp.asarray(q.reshape(-1, 3)), k=8)
    gi = np.asarray(gi).reshape(n_rays, ns, 8)
    gv = np.asarray(gv).reshape(n_rays, ns, 8)
    for chunk in (7, 512):                           # multi-chunk + one-shot
        si, sv = knn.grid_knn_subset(index, jnp.asarray(q),
                                     jnp.asarray(need), k=8, chunk=chunk)
        si, sv = np.asarray(si), np.asarray(sv)
        np.testing.assert_array_equal(si[need], gi[need])
        np.testing.assert_array_equal(sv[need], gv[need])
        assert not si[~need].any() and not sv[~need].any()
    # empty need: no chunk runs, all zeros
    si, sv = knn.grid_knn_subset(index, jnp.asarray(q),
                                 jnp.zeros(n_rays, bool), k=8)
    assert not np.asarray(si).any() and not np.asarray(sv).any()


def test_ray_grid_knn_empty_cloud():
    cap = 128
    pts = np.full((cap, 3), 1e6, np.float32)
    q = np.zeros((3, 5, 3), np.float32)
    index = knn.build_grid_index(jnp.asarray(pts), jnp.asarray(0),
                                 jnp.asarray(0.1))
    rd, ri, rv, _ = knn.ray_grid_knn(index, jnp.asarray(q), k=8)
    assert not np.any(np.asarray(rv))
    assert np.all(np.isinf(np.asarray(rd)))


def test_insert_grid_index_matches_rebuild():
    """Incremental append (knn.insert_grid_index) must produce a table
    BIT-IDENTICAL to build_grid_index over the union — including bucket
    overflow drops and counts — for any sequence of batch sizes. This is
    what lets the mapper skip the CAP-wide argsort on every densify."""
    cap = 4096
    pts, rng = make_cloud(cap, cap, seed=3, scale=0.6)  # dense -> overflows
    cell = jnp.asarray(0.3)
    splits = [0, 700, 701, 1800, 1800, 2500, 4096]  # incl. an empty batch
    c = 8  # small cap to force overflow parity

    idx = knn.build_grid_index(jnp.asarray(pts), jnp.asarray(splits[1]),
                               cell, table_size=256, max_per_cell=c)
    for lo, hi in zip(splits[1:-1], splits[2:]):
        m = 1700  # static batch bound >= every (hi - lo) here
        rows = np.full((m, 3), 1e6, np.float32)
        rows[:hi - lo] = pts[lo:hi]
        ids = lo + np.arange(m, dtype=np.int32)
        valid = np.arange(m) < (hi - lo)
        idx = knn.insert_grid_index(idx, jnp.asarray(rows),
                                    jnp.asarray(ids), jnp.asarray(valid))
        ref = knn.build_grid_index(jnp.asarray(pts), jnp.asarray(hi),
                                   cell, table_size=256, max_per_cell=c)
        for name in ("px", "py", "pz", "pid", "counts"):
            np.testing.assert_array_equal(
                np.asarray(getattr(idx, name)),
                np.asarray(getattr(ref, name)), err_msg=f"{name} @ {hi}")


def test_insert_index_cloudstate_wrapper():
    """pointcloud.insert_index slices the grown rows out of the padded
    buffer and matches a rebuild."""
    import point_slam_tpu.pointcloud as pc

    cap, n0, n1 = 1024, 300, 450
    pts, rng = make_cloud(n1, cap, seed=11)
    cloud = pc.init_cloud(cap, 32, 3)
    packed = cloud.packed.at[:, pc.POS_SL].set(jnp.asarray(pts))
    cloud0 = cloud._replace(packed=packed, n_points=jnp.asarray(n0, jnp.int32))
    cloud1 = cloud._replace(packed=packed, n_points=jnp.asarray(n1, jnp.int32))

    idx = pc.build_index(cloud0, 0.15, table_size=512, max_per_cell=16)
    idx = pc.insert_index(cloud1, idx, jnp.asarray(n0, jnp.int32), m=256)
    ref = pc.build_index(cloud1, 0.15, table_size=512, max_per_cell=16)
    for name in ("px", "py", "pz", "pid", "counts"):
        np.testing.assert_array_equal(np.asarray(getattr(idx, name)),
                                      np.asarray(getattr(ref, name)))


# ---------------------------------------------------------------- packed

def test_packed_grid_knn_in_radius_with_quantization_band():
    """Packed-lattice grid_knn recovers every neighbor that is in-radius by
    more than the quantization margin and never returns one that is
    out-of-radius by more than it (coordinates round by <= g/2 per axis,
    g = cell_size/64, so distances shift by <= g*sqrt(3)/2 each side)."""
    cap, n, q = 2048, 1500, 256
    radius = 0.25
    g = radius / 64.0
    band = 2.0 * g  # > 2 * g*sqrt(3)/2
    pts, rng = make_cloud(n, cap, seed=3)
    queries = (pts[rng.integers(0, n, size=q)] +
               rng.normal(scale=0.08, size=(q, 3)).astype(np.float32))
    idx = knn.build_packed_grid_index(jnp.asarray(pts), jnp.asarray(n),
                                      jnp.asarray(radius),
                                      table_size=1 << 14)
    gd, gi, gv = knn.grid_knn(idx, jnp.asarray(queries), k=8)
    gd, gi, gv = np.asarray(gd), np.asarray(gi), np.asarray(gv)
    # exact distances of the returned winners (what the renderer recomputes)
    re_d = ((queries[:, None, :] - pts[gi]) ** 2).sum(-1)
    re_d = np.where(gv, re_d, np.inf)
    rd, _ = numpy_knn(pts, n, queries, 8)
    inner, outer = (radius - band) ** 2, (radius + band) ** 2
    # every confidently-in-radius oracle neighbor is found
    np.testing.assert_array_equal((rd < inner).sum(1) <= (re_d < radius ** 2).sum(1),
                                  True)
    # neighbor_count contract: the reported distance can only flip the
    # radius decision inside the quantization band. (Beyond-radius
    # candidates ARE returned — radius filtering happens downstream — and
    # a wrap-aliased hash-collision candidate may report a meaninglessly
    # small distance, but its EXACT recomputed distance is what weights
    # and counts consume; the alias test below covers that case.)
    confident_in = re_d < inner          # exact says safely in-radius
    confident_out = re_d > outer         # exact says safely out
    r2 = radius ** 2
    assert np.all(np.where(confident_in, gd < r2, True))
    assert np.all(np.where(confident_out & (re_d < 1.0), gd > r2, True))
    # reported distances track exact ones within the band for true
    # near-field winners (no wrap ambiguity there)
    near = np.isfinite(gd) & (re_d < (2 * radius) ** 2)
    assert np.all(np.abs(np.sqrt(gd[near]) - np.sqrt(re_d[near]))
                  <= band + 1e-6)


def test_packed_vs_f32_winner_agreement():
    """On realistic densities the packed index selects the same winners as
    the f32 planes away from sub-quantum ties."""
    cap, n, q = 4096, 3000, 512
    radius = 0.2
    pts, rng = make_cloud(n, cap, seed=5)
    queries = (pts[rng.integers(0, n, size=q)] +
               rng.normal(scale=0.05, size=(q, 3)).astype(np.float32))
    idx_f = knn.build_grid_index(jnp.asarray(pts), jnp.asarray(n),
                                 jnp.asarray(radius), table_size=1 << 14)
    idx_p = knn.build_packed_grid_index(jnp.asarray(pts), jnp.asarray(n),
                                        jnp.asarray(radius),
                                        table_size=1 << 14)
    _, fi, fv = knn.grid_knn(idx_f, jnp.asarray(queries), k=8)
    _, pi, pv = knn.grid_knn(idx_p, jnp.asarray(queries), k=8)
    fi, fv = np.asarray(fi), np.asarray(fv)
    pi, pv = np.asarray(pi), np.asarray(pv)
    # only IN-RADIUS winners carry weight downstream; the top-8 tail beyond
    # the radius may legitimately reshuffle on sub-quantum ties
    g = radius / 64.0
    inner = (radius - 2 * g) ** 2

    def in_r_set(ids, ok, i):
        ex = ((queries[i] - pts[ids[i]]) ** 2).sum(-1)
        return set(ids[i][(ex < inner) & ok[i]])

    same = sum(in_r_set(fi, fv, i) == in_r_set(pi, pv, i) for i in range(q))
    assert same / q > 0.995, f"in-radius winner-set agreement {same / q:.3f}"


def test_packed_ray_grid_knn_matches_packed_grid_knn():
    """The packed Pallas ray kernel agrees with packed per-sample grid_knn
    on in-radius sets (mirrors test_ray_grid_knn_matches_grid_knn).

    The scene fits inside half the lattice wrap period (1024 * cell/64 =
    16 cells = 3.2 m here, scene span 1.6 m), so hash-collision candidates
    cannot wrap-alias and the in-radius contract is exact. At scales beyond
    the period (real rooms) an alias can displace a winner slot on a small
    fraction of samples — harmless downstream (see
    test_packed_wraparound_alias_is_harmless and the ops/knn.py notes)."""
    cap, n, n_rays, ns = 4096, 3000, 64, 5
    radius = 0.2
    pts, rng = make_cloud(n, cap, seed=5, scale=0.8)
    q = _ray_queries(pts, n, rng, n_rays, ns)
    index = knn.build_packed_grid_index(jnp.asarray(pts), jnp.asarray(n),
                                        jnp.asarray(radius),
                                        table_size=1 << 14)
    gd, gi, gv = knn.grid_knn(index, jnp.asarray(q.reshape(-1, 3)), k=8)
    rd, ri, rv, compact = knn.ray_grid_knn(index, jnp.asarray(q), k=8)
    assert np.all(np.asarray(compact))
    flat_q = q.reshape(-1, 3)
    gi, gv = np.asarray(gi), np.asarray(gv)
    ri, rv = np.asarray(ri), np.asarray(rv)
    ge_d = np.where(gv, ((flat_q[:, None, :] - pts[gi]) ** 2).sum(-1), np.inf)
    re_d = np.where(rv, ((flat_q[:, None, :] - pts[ri]) ** 2).sum(-1), np.inf)
    r2 = radius ** 2
    g_sorted = np.sort(ge_d, axis=1)
    r_sorted = np.sort(re_d, axis=1)
    in_r = g_sorted < r2
    np.testing.assert_allclose(np.where(in_r, g_sorted, 0.0),
                               np.where(in_r, r_sorted, 0.0),
                               rtol=1e-5, atol=1e-9)
    np.testing.assert_array_equal((g_sorted < r2).sum(1),
                                  (r_sorted < r2).sum(1))
    # selection distances come back in metric units (quanta^2 * g^2)
    rdq = np.asarray(rd)
    fin = np.isfinite(rdq) & (np.asarray(rd) > 1e-8)
    np.testing.assert_allclose(rdq[fin], re_d[fin], rtol=0.2, atol=1e-4)


def test_packed_insert_matches_rebuild():
    """Incremental append on the packed table is bit-identical to a full
    rebuild (same contract as the f32 planes)."""
    cap = 4096
    pts, rng = make_cloud(cap, cap, seed=3, scale=0.6)
    cell = jnp.asarray(0.3)
    splits = [0, 700, 701, 1800, 1800, 2500, 4096]
    c = 8

    idx = knn.build_packed_grid_index(jnp.asarray(pts), jnp.asarray(splits[1]),
                                      cell, table_size=256, max_per_cell=c)
    for lo, hi in zip(splits[1:-1], splits[2:]):
        m = 1700
        rows = np.full((m, 3), 1e6, np.float32)
        rows[:hi - lo] = pts[lo:hi]
        ids = lo + np.arange(m, dtype=np.int32)
        valid = np.arange(m) < (hi - lo)
        idx = knn.insert_grid_index(idx, jnp.asarray(rows),
                                    jnp.asarray(ids), jnp.asarray(valid))
        ref = knn.build_packed_grid_index(jnp.asarray(pts), jnp.asarray(hi),
                                          cell, table_size=256,
                                          max_per_cell=c)
        for name in ("pxyz", "pid", "counts"):
            np.testing.assert_array_equal(
                np.asarray(getattr(idx, name)),
                np.asarray(getattr(ref, name)), err_msg=f"{name} @ {hi}")


def test_packed_wraparound_alias_is_harmless():
    """A hash-collision candidate from a far cell may wrap-alias into
    apparent proximity — it must only ever DISPLACE a slot, never carry a
    wrong id, and exact-distance recompute (what the renderer and
    neighbor_count consume) must expose it as far."""
    cell = 0.25
    g = cell / 64.0
    # two points exactly one wrap period apart on x share the lattice coords
    pts = np.zeros((8, 3), np.float32)
    pts[0] = [0.1, 0.1, 0.1]
    pts[1] = [0.1 + 1024 * g, 0.1, 0.1]   # aliases onto pts[0]
    # tiny table so both cells collide into the same bucket often
    idx = knn.build_packed_grid_index(jnp.asarray(pts), jnp.asarray(2),
                                      jnp.asarray(cell), table_size=2,
                                      max_per_cell=8)
    q = np.array([[0.1, 0.1, 0.1]], np.float32)
    d, i, v = knn.grid_knn(idx, jnp.asarray(q), k=8)
    d, i, v = np.asarray(d), np.asarray(i), np.asarray(v)
    # both may be reported near-zero (the alias), but ids are real ids and
    # the exact recompute (renderer contract) reveals the far one
    returned = set(i[0][v[0]])
    assert returned <= {0, 1}
    exact = ((q[0] - pts[i[0]]) ** 2).sum(-1)
    far = (i[0] == 1) & v[0]
    assert np.all(exact[far] > 1.0)


def test_fused_plane_matches_packed_planes():
    """The fused (coords|ids) plane's pxyz/pid views are bitwise identical
    to the two-plane packed build on the same cloud (same _slot_plan, same
    lattice packing, id bits stored bitcast)."""
    cap, n = 4096, 3000
    pts, rng = make_cloud(n, cap, seed=5, scale=0.8)
    p = knn.build_packed_grid_index(jnp.asarray(pts), jnp.asarray(n),
                                    jnp.asarray(0.2), table_size=1 << 10,
                                    max_per_cell=16)
    f = knn.build_fused_grid_index(jnp.asarray(pts), jnp.asarray(n),
                                   jnp.asarray(0.2), table_size=1 << 10,
                                   max_per_cell=16)
    np.testing.assert_array_equal(np.asarray(f.pxyz), np.asarray(p.pxyz))
    np.testing.assert_array_equal(np.asarray(f.pid), np.asarray(p.pid))
    np.testing.assert_array_equal(np.asarray(f.counts), np.asarray(p.counts))


def test_fused_ray_grid_knn_matches_grid_knn():
    """The fused-plane Pallas ray kernel agrees with per-sample grid_knn on
    in-radius sets (mirrors test_packed_ray_grid_knn_matches_packed_grid_knn
    — same scene, same contract, one gathered plane instead of two)."""
    cap, n, n_rays, ns = 4096, 3000, 64, 5
    radius = 0.2
    pts, rng = make_cloud(n, cap, seed=5, scale=0.8)
    q = _ray_queries(pts, n, rng, n_rays, ns)
    index = knn.build_fused_grid_index(jnp.asarray(pts), jnp.asarray(n),
                                       jnp.asarray(radius),
                                       table_size=1 << 14)
    gd, gi, gv = knn.grid_knn(index, jnp.asarray(q.reshape(-1, 3)), k=8)
    rd, ri, rv, compact = knn.ray_grid_knn(index, jnp.asarray(q), k=8)
    assert np.all(np.asarray(compact))
    flat_q = q.reshape(-1, 3)
    gi, gv = np.asarray(gi), np.asarray(gv)
    ri, rv = np.asarray(ri), np.asarray(rv)
    ge_d = np.where(gv, ((flat_q[:, None, :] - pts[gi]) ** 2).sum(-1), np.inf)
    re_d = np.where(rv, ((flat_q[:, None, :] - pts[ri]) ** 2).sum(-1), np.inf)
    r2 = radius ** 2
    g_sorted = np.sort(ge_d, axis=1)
    r_sorted = np.sort(re_d, axis=1)
    in_r = g_sorted < r2
    np.testing.assert_allclose(np.where(in_r, g_sorted, 0.0),
                               np.where(in_r, r_sorted, 0.0),
                               rtol=1e-5, atol=1e-9)
    np.testing.assert_array_equal((g_sorted < r2).sum(1),
                                  (r_sorted < r2).sum(1))


def test_fused_insert_matches_rebuild():
    """Incremental append on the fused table is bit-identical to a full
    rebuild (same contract as the packed/f32 planes)."""
    cap = 4096
    pts, rng = make_cloud(cap, cap, seed=3, scale=0.6)
    cell = jnp.asarray(0.3)
    splits = [0, 700, 701, 1800, 1800, 2500, 4096]
    c = 8

    idx = knn.build_fused_grid_index(jnp.asarray(pts), jnp.asarray(splits[1]),
                                     cell, table_size=256, max_per_cell=c)
    for lo, hi in zip(splits[1:-1], splits[2:]):
        m = 1700
        rows = np.full((m, 3), 1e6, np.float32)
        rows[:hi - lo] = pts[lo:hi]
        ids = lo + np.arange(m, dtype=np.int32)
        valid = np.arange(m) < (hi - lo)
        idx = knn.insert_grid_index(idx, jnp.asarray(rows),
                                    jnp.asarray(ids), jnp.asarray(valid))
        ref = knn.build_fused_grid_index(jnp.asarray(pts), jnp.asarray(hi),
                                         cell, table_size=256,
                                         max_per_cell=c)
        np.testing.assert_array_equal(
            np.asarray(idx.plane), np.asarray(ref.plane), err_msg=f"@ {hi}")
        np.testing.assert_array_equal(
            np.asarray(idx.counts), np.asarray(ref.counts))
