"""Banded-gram Pallas kernel vs the dense kernel (interpret mode on CPU).

The banded kernel (``pallas_kernels._make_banded_kernel``) computes only the
128-column blocks of the Gauss-Newton gram that can be nonzero given the
spatial support of the deformation basis; these tests pin that it reproduces
the dense kernel (and the plain XLA reference) on real band-structured
feature matrices, and that the band-window computation actually covers every
nonzero column.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from superdsm_tpu.dsm import pallas_kernels as pk
from superdsm_tpu.dsm.smooth import build_smooth_matrix, subsample_grid
from superdsm_tpu.dsm.solver import _poly_basis, _data_grad_hess


def _make_band_problem(seed=0, P=2048, K=506, side=94, stride=4, sigma=2.0,
                       cutoff=8):
    """A padded single-problem batch with a real banded G (disk mask)."""
    rng = np.random.RandomState(seed)
    rr, cc = np.mgrid[:side, :side]
    mask = (rr - side // 2) ** 2 + (cc - side // 2) ** 2 <= (side // 2 - 1) ** 2
    pts = np.argwhere(mask)  # row-major sorted
    npix = min(len(pts), P)
    pts = pts[:npix]
    grid = subsample_grid(mask, stride)
    sub = np.argwhere(grid & mask)[:K]
    k = len(sub)
    assert k > 300, 'test region too small to exercise multiple band blocks'

    n = 6 + K
    PIX = np.zeros((1, P, 2), np.float32)
    PIX[0, :npix] = pts
    W = np.zeros((1, P), np.float32)
    W[0, :npix] = 1.0
    SUB = np.full((1, K, 2), -10.0 * (cutoff + 1), np.float32)
    SUB[0, :k] = sub
    KM = np.zeros((1, K), np.float32)
    KM[0, :k] = 1.0
    coords = PIX / np.float32(side)
    Q = np.asarray(_poly_basis(jnp.asarray(coords)))
    G = np.asarray(build_smooth_matrix(jnp.asarray(PIX[0]), jnp.asarray(SUB[0]),
                                       sigma, cutoff, jnp.asarray(KM[0])))[None]
    Bf = np.concatenate([Q, G], axis=2).astype(np.float32)
    yv = (rng.randn(1, P) * W).astype(np.float32)
    s = (rng.randn(1, P) * 0.5).astype(np.float32)
    return Bf, s, yv, W, PIX, SUB, KM, n, k, npix


@pytest.fixture(autouse=True)
def _interpret_mode():
    prev = pk._FORCE_INTERPRET
    pk._FORCE_INTERPRET = True
    # interpret is read at trace time; drop cached traces of the jit wrapper
    pk.fused_grad_hess_batched.clear_cache()
    yield
    pk._FORCE_INTERPRET = prev
    pk.fused_grad_hess_batched.clear_cache()


def test_band_window_covers_all_nonzero_columns():
    Bf, s, yv, W, PIX, SUB, KM, n, k, npix = _make_band_problem()
    P = Bf.shape[1]
    tp = pk._tile_rows(P, n)
    cb, fits = pk.compute_band_blocks(
        jnp.asarray(PIX[..., 0]), jnp.asarray(W), jnp.asarray(SUB[..., 0]),
        jnp.asarray(KM), 8.0, n, tp)
    assert bool(fits)
    cb = np.asarray(cb)
    nband = pk._NBAND_BY_N[n]
    for t in range(P // tp):
        rows = slice(t * tp, (t + 1) * tp)
        # columns with any nonzero entry among VALID pixels of this tile
        nz = np.any(np.abs(Bf[0, rows][W[0, rows] > 0]) > 0, axis=0)
        cols = np.nonzero(nz)[0]
        c0 = int(cb[0, t]) * 128
        covered = (cols < 128) | ((cols >= c0) & (cols < c0 + 128 * nband))
        assert covered.all(), f'tile {t}: uncovered columns {cols[~covered]}'


def test_banded_matches_dense_and_reference():
    Bf, s, yv, W, PIX, SUB, KM, n, k, npix = _make_band_problem()
    P = Bf.shape[1]
    tp = pk._tile_rows(P, n)
    cb, fits = pk.compute_band_blocks(
        jnp.asarray(PIX[..., 0]), jnp.asarray(W), jnp.asarray(SUB[..., 0]),
        jnp.asarray(KM), 8.0, n, tp)
    assert bool(fits)

    g_dense, H_dense = pk.fused_grad_hess_batched(
        jnp.asarray(Bf), jnp.asarray(s), jnp.asarray(yv), jnp.asarray(W))
    g_band, H_band = pk.fused_grad_hess_batched(
        jnp.asarray(Bf), jnp.asarray(s), jnp.asarray(yv), jnp.asarray(W),
        cb=cb, fits=fits)
    np.testing.assert_allclose(np.asarray(g_band), np.asarray(g_dense),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(H_band), np.asarray(H_dense),
                               rtol=1e-5, atol=1e-5)

    g_ref, H_ref = jax.vmap(_data_grad_hess)(
        jnp.asarray(Bf), jnp.asarray(s), jnp.asarray(yv), jnp.asarray(W))
    np.testing.assert_allclose(np.asarray(g_band), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(H_band), np.asarray(H_ref),
                               rtol=1e-4, atol=1e-4)


def test_banded_fallback_when_band_does_not_fit():
    """fits=False must route through the dense kernel (identical results)."""
    Bf, s, yv, W, PIX, SUB, KM, n, k, npix = _make_band_problem()
    P = Bf.shape[1]
    tp = pk._tile_rows(P, n)
    cb, _ = pk.compute_band_blocks(
        jnp.asarray(PIX[..., 0]), jnp.asarray(W), jnp.asarray(SUB[..., 0]),
        jnp.asarray(KM), 8.0, n, tp)
    g_dense, H_dense = pk.fused_grad_hess_batched(
        jnp.asarray(Bf), jnp.asarray(s), jnp.asarray(yv), jnp.asarray(W))
    g_fb, H_fb = pk.fused_grad_hess_batched(
        jnp.asarray(Bf), jnp.asarray(s), jnp.asarray(yv), jnp.asarray(W),
        cb=cb, fits=jnp.asarray(False))
    np.testing.assert_array_equal(np.asarray(g_fb), np.asarray(g_dense))
    np.testing.assert_array_equal(np.asarray(H_fb), np.asarray(H_dense))


def test_triangle_matches_full_dense_and_reference():
    """The triangle-blocked dense kernel (u <= v block pairs + transpose
    mirror) must reproduce the full dense kernel on a generic (non-banded)
    feature matrix — it is the default full-width gram on TPU."""
    rng = np.random.RandomState(2)
    B, P, n = 2, 1024, 512
    Bf = (rng.rand(B, P, n) - 0.5).astype(np.float32)
    s = rng.randn(B, P).astype(np.float32)
    yv = np.sign(rng.randn(B, P)).astype(np.float32)
    w = rng.rand(B, P).astype(np.float32)

    act = jnp.ones((B,), jnp.int32)
    g_tri, H_tri = pk._tri_grad_hess_call(
        jnp.asarray(Bf), jnp.stack([s, yv, w], axis=1), act)
    g_dense, H_dense = pk._fused_grad_hess_call(
        jnp.asarray(Bf), jnp.stack([s, yv, w], axis=1), act)
    np.testing.assert_array_equal(np.asarray(g_tri),
                                  np.asarray(g_dense[:, 0, :]))
    np.testing.assert_allclose(np.asarray(H_tri), np.asarray(H_dense),
                               rtol=1e-5, atol=1e-5)
    # the mirrored off-diagonal blocks are exact transposes of each other
    # (diagonal blocks only symmetric to rounding: the kappa multiply order
    # differs between (i, j) and (j, i))
    H_tri = np.asarray(H_tri)
    np.testing.assert_array_equal(H_tri[:, 128:, :128],
                                  H_tri[:, :128, 128:].transpose(0, 2, 1))

    g_ref, H_ref = jax.vmap(_data_grad_hess)(
        jnp.asarray(Bf), jnp.asarray(s), jnp.asarray(yv), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(g_tri), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(H_tri, np.asarray(H_ref),
                               rtol=1e-4, atol=1e-4)


def test_band_detects_misfit():
    """A shuffled (non-row-sorted) subsample grid must report fits=False
    rather than silently dropping nonzero blocks."""
    Bf, s, yv, W, PIX, SUB, KM, n, k, npix = _make_band_problem()
    rng = np.random.RandomState(1)
    perm = rng.permutation(k)
    SUB_shuf = SUB.copy()
    SUB_shuf[0, :k] = SUB[0, perm]
    P = Bf.shape[1]
    tp = pk._tile_rows(P, n)
    _, fits = pk.compute_band_blocks(
        jnp.asarray(PIX[..., 0]), jnp.asarray(W),
        jnp.asarray(SUB_shuf[..., 0]), jnp.asarray(KM), 8.0, n, tp)
    assert not bool(fits)


def test_frozen_lanes_skip_but_active_lanes_bitwise_unchanged():
    """The per-lane activity flag (``active=``) must leave active lanes
    bitwise identical to the all-active call (the solver's trajectory
    invariant) and zero out frozen lanes, in all three kernels: dense,
    triangle-blocked, and banded."""
    Bf1, s1, yv1, W1, PIX, SUB, KM, n, k, npix = _make_band_problem(seed=3)
    # two-lane batch: lane 0 = the band problem, lane 1 = a copy with
    # different data (so a cross-lane mixup would be caught)
    Bf = np.concatenate([Bf1, Bf1[::-1] * 0.5], axis=0)
    s = np.concatenate([s1, s1 * -0.7], axis=0)
    yv = np.concatenate([yv1, -yv1], axis=0)
    W = np.concatenate([W1, W1], axis=0)
    args = tuple(map(jnp.asarray, (Bf, s, yv, W)))

    P = Bf.shape[1]
    tp = pk._tile_rows(P, n)
    cb, fits = pk.compute_band_blocks(
        jnp.asarray(np.concatenate([PIX[..., 0]] * 2)),
        jnp.asarray(W), jnp.asarray(np.concatenate([SUB[..., 0]] * 2)),
        jnp.asarray(np.concatenate([KM] * 2)), 8.0, n, tp)

    for kwargs in (dict(),                      # dense/triangle path
                   dict(cb=cb, fits=fits)):     # banded path
        g_all, H_all = pk.fused_grad_hess_batched(*args, **kwargs)
        act = jnp.asarray([0, 1], jnp.int32)
        g_act, H_act = pk.fused_grad_hess_batched(*args, active=act, **kwargs)
        np.testing.assert_array_equal(np.asarray(g_act[1]),
                                      np.asarray(g_all[1]))
        np.testing.assert_array_equal(np.asarray(H_act[1]),
                                      np.asarray(H_all[1]))
        assert not np.any(np.asarray(g_act[0]))
        assert not np.any(np.asarray(H_act[0]))
