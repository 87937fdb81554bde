import numpy as np
import pytest
from scipy import ndimage as ndi

from tissue_image_processing_tpu.ops.filters import (
    gaussian_blur, band_pass_filter, block_reduce, resize_bilinear)
from tissue_image_processing_tpu.ops.percentile import (
    percentile, masked_percentile, segment_percentile)
from tissue_image_processing_tpu.ops.local_threshold import threshold_local_max
from tissue_image_processing_tpu.ops import morphology as morph


@pytest.mark.parametrize("std", [0.5, 1.0, 3.0])
def test_gaussian_blur_matches_scipy_2d(rng, std):
    x = rng.standard_normal((37, 53)).astype(np.float32)
    got = np.asarray(gaussian_blur(x, std))
    want = ndi.gaussian_filter(x.astype(np.float64), std, mode="nearest")
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


def test_gaussian_blur_matches_scipy_3d_anisotropic(rng):
    x = rng.standard_normal((9, 24, 31)).astype(np.float32)
    got = np.asarray(gaussian_blur(x, (0.5, 1.0, 1.0)))
    want = ndi.gaussian_filter(x.astype(np.float64), (0.5, 1.0, 1.0), mode="nearest")
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


def test_band_pass_filter(rng):
    x = rng.standard_normal((40, 40)).astype(np.float32)
    got = np.asarray(band_pass_filter(x, 1.0, 4.0))
    want = (ndi.gaussian_filter(x.astype(np.float64), 1.0, mode="nearest")
            - ndi.gaussian_filter(x.astype(np.float64), 4.0, mode="nearest"))
    np.testing.assert_allclose(got, want, rtol=0, atol=3e-5)


def test_block_reduce_mean_var(rng):
    x = rng.standard_normal((3, 12, 16)).astype(np.float32)
    got = np.asarray(block_reduce(x, (1, 4, 4), "mean"))
    want = x.reshape(3, 3, 4, 4, 4).mean(axis=(2, 4))
    np.testing.assert_allclose(got, want, atol=1e-6)
    gotv = np.asarray(block_reduce(x, (1, 4, 4), "var"))
    wantv = x.reshape(3, 3, 4, 4, 4).transpose(0, 1, 3, 2, 4).reshape(3, 3, 4, 16).var(axis=-1)
    np.testing.assert_allclose(gotv, wantv, atol=1e-5)


def test_percentiles(rng):
    x = rng.standard_normal((50, 60)).astype(np.float32)
    np.testing.assert_allclose(float(percentile(x, 95.0)), np.percentile(x, 95), atol=1e-5)
    mask = x > 0
    np.testing.assert_allclose(float(masked_percentile(x, mask, 95.0)),
                               np.percentile(x[mask], 95), atol=1e-5)


def test_masked_percentile_empty(rng):
    x = rng.standard_normal((8, 8)).astype(np.float32)
    assert float(masked_percentile(x, np.zeros_like(x, bool), 50.0)) == 0.0


def test_segment_percentile(rng):
    vals = rng.standard_normal(500).astype(np.float32)
    segs = rng.integers(0, 7, 500)
    got = np.asarray(segment_percentile(vals, segs, 7, 10.0))
    for s in range(7):
        np.testing.assert_allclose(got[s], np.percentile(vals[segs == s], 10), atol=1e-5)


def test_threshold_local_max(rng):
    x = (rng.random((45, 52)) * 100).astype(np.float32)
    got = np.asarray(threshold_local_max(x, 15))
    want = ndi.maximum_filter(x, size=15, mode="reflect")
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_maximum_minimum_filter(rng):
    x = rng.integers(0, 50, (30, 41)).astype(np.int32)
    got = np.asarray(morph.maximum_filter(x, 5))
    want = ndi.maximum_filter(x, size=(5, 5), mode="constant", cval=0)
    np.testing.assert_array_equal(got, want)
    got = np.asarray(morph.minimum_filter(x, 3))
    want = ndi.minimum_filter(x, size=(3, 3), mode="constant", cval=0)
    np.testing.assert_array_equal(got, want)


def test_plus_filters(rng):
    x = rng.integers(0, 50, (30, 41)).astype(np.int32)
    fp = np.array([[0, 1, 0], [1, 0, 1], [0, 1, 0]])
    got = np.asarray(morph.plus_maximum_filter(x, cval=0))
    want = ndi.maximum_filter(x, footprint=fp, mode="constant", cval=0)
    np.testing.assert_array_equal(got, want)
    got = np.asarray(morph.plus_minimum_filter(x, cval=0))
    want = ndi.minimum_filter(x, footprint=fp, mode="constant", cval=0)
    np.testing.assert_array_equal(got, want)


def test_resize_shape():
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    out = np.asarray(resize_bilinear(x, (6, 8)))
    assert out.shape == (6, 8)


def test_gaussian_blur_large_sigma_matmul_path(rng):
    # sigma >= ~8 takes the banded-matmul (MXU) path; must stay exact vs scipy
    x = rng.standard_normal((40, 200)).astype(np.float32)
    got = np.asarray(gaussian_blur(x, (3.0, 30.0)))
    want = ndi.gaussian_filter(x.astype(np.float64), (3.0, 30.0), mode="nearest")
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_gaussian_blur_matmul_path_3d(rng):
    x = rng.standard_normal((4, 64, 100)).astype(np.float32)
    got = np.asarray(gaussian_blur(x, (0.5, 30.0, 30.0)))
    want = ndi.gaussian_filter(x.astype(np.float64), (0.5, 30.0, 30.0), mode="nearest")
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_blur3d_pallas_matches_xla_path():
    import jax.numpy as jnp
    import tissue_image_processing_tpu.ops.blur_pallas as BP
    import tissue_image_processing_tpu.ops.filters as F
    orig_call = BP.pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig_call(*a, **k)

    rng = np.random.default_rng(2)
    vol = rng.random((6, 128, 256)).astype(np.float32) * 100
    img2d = rng.random((128, 256)).astype(np.float32)
    want3 = np.asarray(F.gaussian_blur(jnp.asarray(vol), (0.5, 1.0, 1.0)))
    want2 = np.asarray(F.gaussian_blur(jnp.asarray(img2d), (2.0, 2.0)))
    BP.pl.pallas_call = interp_call
    BP._blur3d_fn.cache_clear()
    F.FORCE_PALLAS_BLUR = True
    try:
        got3 = np.asarray(F.gaussian_blur.__wrapped__(jnp.asarray(vol), (0.5, 1.0, 1.0)))
        got2 = np.asarray(F.gaussian_blur.__wrapped__(jnp.asarray(img2d), (2.0, 2.0)))
    finally:
        F.FORCE_PALLAS_BLUR = None
        BP.pl.pallas_call = orig_call
        BP._blur3d_fn.cache_clear()
    np.testing.assert_allclose(got3, want3, rtol=2e-6, atol=1e-4)
    np.testing.assert_allclose(got2, want2, rtol=2e-6, atol=1e-4)
