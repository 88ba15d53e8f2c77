"""Tests for scale estimation and automatic configuration."""

import numpy as np
import pytest

from superdsm_tpu.automation import _estimate_scale, create_config, _create_config_entry
from superdsm_tpu.pipeline import create_default_pipeline
from superdsm_tpu.config import Config
from superdsm_tpu.ops.blob import blob_doh


def _blob_field(radius, n=9, H=400, W=400, seed=0):
    rng = np.random.RandomState(seed)
    rr, cc = np.indices((H, W))
    g = np.zeros((H, W), np.float32)
    grid = np.linspace(60, 340, 3).astype(int)
    for r0 in grid:
        for c0 in grid:
            g += np.exp(-(((rr - r0) ** 2 + (cc - c0) ** 2) / (2 * (radius * 0.6) ** 2)))
    g += rng.randn(H, W).astype(np.float32) * 0.02
    return g


def test_blob_doh_finds_blobs():
    g = _blob_field(30)
    sigmas = np.linspace(20, 200, 10) / np.sqrt(2)
    blobs = blob_doh(g, sigmas, threshold=0.01)
    assert len(blobs) >= 9


def test_estimate_scale_in_range():
    g = _blob_field(30)
    scale, blobs, inliers = _estimate_scale(g)
    # radius grid is quantized at 20-px steps; accept the two nearest bins
    assert 10 <= scale <= 35


def test_create_config_expands_AF_keys():
    pipeline = create_default_pipeline()
    cfg, scale = create_config(pipeline, Config({'AF_scale': 40}), None)
    assert scale == 40
    assert cfg['dsm/alpha'] == pytest.approx(0.0005 * 40 ** 2)
    assert cfg['dsm/smooth_amount'] == int(0.2 * 40)
    assert cfg['c2f-region-analysis/min_atom_radius'] == int(0.33 * 40 * np.sqrt(2))
    assert cfg['global-energy-minimization/beta'] == pytest.approx(0.66 * 40 ** 2)


def test_create_config_user_factor_override():
    pipeline = create_default_pipeline()
    base = Config({'AF_scale': 40, 'dsm': {'AF_alpha': 0.001}})
    cfg, _ = create_config(pipeline, base, None)
    assert cfg['dsm/alpha'] == pytest.approx(0.001 * 40 ** 2)


def test_create_config_entry_clamps():
    cfg = Config()
    _create_config_entry(cfg, 'ns/key', 10, 0.5, type=int, min=7)
    assert cfg['ns/key'] == 7
    cfg2 = Config()
    _create_config_entry(cfg2, 'ns/key', 10, 2.0, type=int, max=12)
    assert cfg2['ns/key'] == 12


def test_estimate_scale_fails_on_blob_free_image():
    """A blob-free image must raise the reference's 'scale estimation
    failed' error (``/root/reference/superdsm/automation.py:41-68``) —
    the batch CLI then surfaces the task failure via fork isolation."""
    import pytest
    from superdsm_tpu.automation import _estimate_scale
    flat = np.full((256, 256), 0.5, np.float32)
    with pytest.raises(ValueError, match='scale estimation failed'):
        _estimate_scale(flat)
