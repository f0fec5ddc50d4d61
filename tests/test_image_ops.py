import numpy as np
import jax.numpy as jnp
from scipy import ndimage

from point_slam_tpu.common import image


# skimage sobel kernels (the reference's gradient source, src/common.py:98-101)
_HS = np.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]]) / 4.0
_VS = _HS.T


def _skimage_sobel_h(img):
    return ndimage.correlate(img, _HS, mode="reflect")


def _skimage_sobel_v(img):
    return ndimage.correlate(img, _VS, mode="reflect")


def test_sobel_matches_skimage_semantics():
    rng = np.random.default_rng(0)
    img = rng.random((37, 53)).astype(np.float64)
    np.testing.assert_allclose(np.asarray(image.sobel_h(jnp.asarray(img, jnp.float32))),
                               _skimage_sobel_h(img), atol=1e-5)
    np.testing.assert_allclose(np.asarray(image.sobel_v(jnp.asarray(img, jnp.float32))),
                               _skimage_sobel_v(img), atol=1e-5)


def test_gradient_magnitude():
    rng = np.random.default_rng(1)
    img = rng.random((24, 31, 3))
    gray = img @ np.array([0.2125, 0.7154, 0.0721])
    ref = np.sqrt(_skimage_sobel_h(gray) ** 2 + _skimage_sobel_v(gray) ** 2)
    ours = np.asarray(image.color_gradient_magnitude(jnp.asarray(img, jnp.float32)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_dynamic_radius_ramp():
    from scipy.interpolate import interp1d
    thr, rmax, rmin, ratio = 0.15, 0.08, 0.02, 2.0
    g = np.linspace(0, thr, 100)
    fn_add = interp1d([0, 0.01, thr], [rmax, rmax, rmin])
    img = np.zeros((8, 8, 3), np.float32)
    r_add, r_query = image.dynamic_radius_maps(jnp.asarray(img), rmax, rmin, ratio, thr)
    # zero-gradient image -> everything at rmax / ratio*rmax
    np.testing.assert_allclose(np.asarray(r_add), rmax, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r_query), ratio * rmax, atol=1e-6)
    # ramp itself
    ours = np.asarray(image.piecewise_linear(jnp.asarray(g, jnp.float32),
                                             [0, 0.01, thr], [rmax, rmax, rmin]))
    np.testing.assert_allclose(ours, fn_add(g), atol=1e-6)


def test_masked_median_torch_semantics():
    import torch
    rng = np.random.default_rng(2)
    for n in [1, 2, 5, 8, 17]:
        x = rng.normal(size=32).astype(np.float32)
        mask = np.zeros(32, bool)
        mask[rng.choice(32, size=n, replace=False)] = True
        ours = float(image.masked_median(jnp.asarray(x), jnp.asarray(mask)))
        ref = float(torch.median(torch.from_numpy(x[mask])))
        assert ours == ref


def test_masked_mean_max():
    x = jnp.asarray([1.0, 2.0, 3.0, 100.0])
    m = jnp.asarray([True, True, True, False])
    assert float(image.masked_mean(x, m)) == 2.0
    assert float(image.masked_max(x, m)) == 3.0


def test_masked_median_radix_matches_sort():
    """The shipped radix-select masked_median is bit-identical to the
    full-sort reference on every edge: duplicates, negatives, +-0, inf
    fills, empty mask, single element, even/odd counts."""
    import jax
    import jax.numpy as jnp
    from point_slam_tpu.common import image

    rng = np.random.default_rng(7)
    cases = []
    for n in (1, 2, 3, 5000):
        x = rng.normal(0, 3, n).astype(np.float32)
        m = rng.random(n) < 0.7
        cases.append((x, m))
    x = np.array([1.0, 1.0, 1.0, 2.0, -0.0, 0.0, -5.5], np.float32)
    cases.append((x, np.ones(7, bool)))
    cases.append((x, np.zeros(7, bool)))          # empty mask -> +inf
    cases.append((np.full(9, 2.5, np.float32), np.ones(9, bool)))
    for x, m in cases:
        a = float(image.masked_median_sort(jnp.asarray(x), jnp.asarray(m)))
        b = float(image.masked_median(jnp.asarray(x), jnp.asarray(m)))
        if np.isinf(a):
            assert np.isinf(b)
        else:
            assert a == b, (a, b, x[m][np.argsort(x[m])])
