"""Tests of the device/native ops against their scipy ground truths."""

import numpy as np
import scipy.ndimage as ndi
import pytest

from superdsm_tpu.ops.gaussian import gaussian_filter, gaussian_filter_host
from superdsm_tpu.ops.edt import edt, edt_jax
from superdsm_tpu.ops.watershed import watershed, _watershed_py
from superdsm_tpu.ops.morphology import disk, binary_dilation, binary_erosion


def test_gaussian_matches_scipy():
    rng = np.random.RandomState(0)
    img = rng.rand(64, 80).astype(np.float32)
    for sigma in (1.0, 2.5, 7.0):
        dev = np.asarray(gaussian_filter(img, sigma))
        host = gaussian_filter_host(img, sigma)
        np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-5)


def test_gaussian_large_sigma_small_image():
    img = np.random.RandomState(1).rand(20, 20).astype(np.float32)
    dev = np.asarray(gaussian_filter(img, 40.0))
    host = gaussian_filter_host(img, 40.0)
    np.testing.assert_allclose(dev, host, rtol=1e-3, atol=1e-4)


def test_gaussian_toeplitz_path_is_near_exact():
    """Long kernels run as banded-Toeplitz matmuls at Precision.HIGHEST
    (the B=1,C=1 TPU conv lowering is bf16 — measured ~61 int16 quanta of
    preprocess error); the matmul path must track the f64 truth to f32
    rounding, orders of magnitude inside the preprocess int16 quantum."""
    import scipy.ndimage as _ndi
    rng = np.random.RandomState(3)
    img = rng.rand(96, 130).astype(np.float32)
    dev = np.asarray(gaussian_filter(img, 40.0))
    truth = _ndi.gaussian_filter(img.astype(np.float64), 40.0, truncate=4.0)
    np.testing.assert_allclose(dev, truth, rtol=0, atol=2e-7)


def test_edt_jax_matches_scipy():
    rng = np.random.RandomState(2)
    mask = rng.rand(40, 56) < 0.7
    np.testing.assert_allclose(np.asarray(edt_jax(mask)), edt(mask), atol=1e-3)


def test_watershed_native_matches_python():
    rng = np.random.RandomState(3)
    img = ndi.gaussian_filter(rng.rand(40, 40), 3)
    markers = np.zeros((40, 40), np.int32)
    markers[10, 10] = 1
    markers[30, 30] = 2
    mask = np.ones((40, 40), bool)
    mask[:, 19:21] = (np.abs(np.arange(40) - 20)[:, None] < 15)
    a = watershed(img, markers, mask)
    b = _watershed_py(img, markers, mask, 4)
    # native and python floods may tie-break differently on plateau pixels;
    # demand agreement on the overwhelming majority
    agree = (a == b).mean()
    assert agree > 0.99, agree
    assert set(np.unique(a)) <= {0, 1, 2}


def test_watershed_splits_two_basins():
    rr, cc = np.indices((30, 30))
    relief = np.minimum((rr - 8) ** 2 + (cc - 8) ** 2,
                        (rr - 22) ** 2 + (cc - 22) ** 2).astype(float)
    markers = np.zeros((30, 30), np.int32)
    markers[8, 8] = 1
    markers[22, 22] = 2
    labels = watershed(relief, markers)
    assert labels[8, 8] == 1 and labels[22, 22] == 2
    assert (labels > 0).all()
    assert 0.3 < (labels == 1).mean() < 0.7


def test_morphology_matches_scipy():
    rng = np.random.RandomState(4)
    mask = rng.rand(30, 30) < 0.4
    fp = disk(2)
    np.testing.assert_array_equal(
        binary_dilation(mask, fp), ndi.binary_dilation(mask, structure=fp.astype(bool)))
    np.testing.assert_array_equal(
        binary_erosion(mask, fp), ndi.binary_erosion(mask, structure=fp.astype(bool)))


def test_watershed_native_signed_zero_ties():
    """-0.0 and +0.0 reliefs must flood as an age-order tie, not as distinct
    priorities (regression: the packed-heap-key rewrite initially ordered
    -0.0 strictly before +0.0, flipping plateau labels vs the heapq
    fallback, whose Python-float compare treats them as equal)."""
    rng = np.random.RandomState(7)
    img = np.round(rng.randn(48, 64) * 2).astype(np.float32)  # yields -0.0
    assert np.any(np.signbit(img) & (img == 0)), 'case must contain -0.0'
    markers = np.zeros((48, 64), np.int32)
    for label, (r, c) in enumerate(
            [(5, 5), (40, 10), (20, 50), (44, 60), (10, 30)], start=1):
        markers[r, c] = label
    for conn in (4, 8):
        a = watershed(img, markers, connectivity=conn)
        b = _watershed_py(img, markers, None, conn)
        np.testing.assert_array_equal(a, b)


def test_native_edt_matches_scipy_exactly():
    from superdsm_tpu.ops.edt import edt as edt_op
    rng = np.random.RandomState(11)
    cases = [rng.rand(37, 61) < p for p in (0.1, 0.5, 0.9)]
    cases += [np.zeros((20, 30), bool), np.ones((20, 30), bool)]
    m = np.ones((25, 25), bool); m[12, 12] = False; cases.append(m)
    for m in cases:
        np.testing.assert_array_equal(edt_op(m), ndi.distance_transform_edt(m))


def test_native_max_filter3_matches_scipy_exactly():
    from superdsm_tpu.ops.morphology import max_filter3, disk
    rng = np.random.RandomState(12)
    for dtype in (np.float64, np.float32):
        img = rng.randn(41, 53).astype(dtype)
        a4 = ndi.maximum_filter(img, footprint=disk(1))
        a8 = ndi.maximum_filter(img, footprint=np.ones((3, 3), bool))
        np.testing.assert_array_equal(max_filter3(img, 4), a4)
        np.testing.assert_array_equal(max_filter3(img, 8), a8)
        assert max_filter3(img, 8).dtype == img.dtype
