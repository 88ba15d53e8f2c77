"""Preprocessing-stage semantics tests.

Validates the fused device program against a straightforward host
implementation of the reference's offset computation
(``/root/reference/superdsm/preprocess.py:39-68``), including the
NIH3T3-style intensity-variation handling (``offset_clip`` blend and
``lower_clip_mean``) that the default pipeline configs never exercise
(cf. BASELINE.json config 2).
"""

import numpy as np
import scipy.ndimage as ndi

from superdsm_tpu.preprocess import Preprocessing
from superdsm_tpu.config import Config


def _host_reference(g, sigma1, sigma2, offset_clip, lower_clip_mean):
    """The reference's offset math in plain scipy (truncate matches the
    device program's 4.0)."""
    gf = lambda x, s: ndi.gaussian_filter(x, s, truncate=4.0)
    offset_original = gf(g, sigma2)
    if np.isinf(offset_clip):
        offset = offset_original
    else:
        clip_abs = offset_clip * g.std()
        offset_clipped = gf(np.clip(g, 0, clip_abs), sigma2)
        clip_area = g > clip_abs
        blend = ndi.distance_transform_edt(~clip_area)
        blend = np.clip(sigma2 - blend, 0, np.inf)
        bmax = blend.max()
        blend = (blend / (bmax if bmax > 0 else 1)) ** 2
        offset = (1 - blend) * offset_clipped + blend * offset_original
    if lower_clip_mean:
        offset = np.maximum(offset, g.mean())
    return gf(g, sigma1) - offset


def _glare_image(seed=0, H=160, W=160):
    """Dim nuclei next to a bright autofluorescent patch (NIH3T3-style)."""
    rng = np.random.RandomState(seed)
    rr, cc = np.indices((H, W))
    g = np.zeros((H, W), np.float32)
    for (r0, c0) in [(40, 40), (40, 120), (120, 40)]:
        g += 0.25 * np.exp(-(((rr - r0) ** 2 + (cc - c0) ** 2) / (2 * 9.0 ** 2)))
    # bright glare blob dominating the background estimate
    g += 1.0 * np.exp(-(((rr - 120) ** 2 + (cc - 120) ** 2) / (2 * 26.0 ** 2)))
    g += rng.randn(H, W).astype(np.float32) * 0.01
    return np.clip(g, 0, None).astype(np.float32)


def _run_stage(g, **cfg_entries):
    stage = Preprocessing()
    cfg = Config({'preprocess': cfg_entries})
    data = {'g_raw': g}
    stage(data, cfg)
    return data['y']


def _assert_matches_host(g, **kw):
    y = _run_stage(g, **kw)
    y_ref = _host_reference(g, kw.get('sigma1', np.sqrt(2)),
                            kw.get('sigma2', 20), kw.get('offset_clip', 3),
                            kw.get('lower_clip_mean', False))
    scale = np.abs(y_ref).max()
    assert np.abs(y - y_ref).max() < 5e-3 * scale


def test_matches_reference_math_default_clip():
    _assert_matches_host(_glare_image(), sigma2=20, offset_clip=3)


def test_matches_reference_math_no_clip():
    _assert_matches_host(_glare_image(), sigma2=20, offset_clip=np.inf)


def test_matches_reference_math_lower_clip_mean():
    _assert_matches_host(_glare_image(), sigma2=20, offset_clip=3,
                         lower_clip_mean=True)


def test_offset_clip_rescues_dim_nuclei():
    """Near a glare area the unclipped background estimate swallows dim
    nuclei; the clipped blend must keep them foreground (the reason the
    NIH3T3 config sets offset_clip)."""
    g = _glare_image()
    y_clip = _run_stage(g, sigma2=20, offset_clip=3)
    y_noclip = _run_stage(g, sigma2=20, offset_clip=np.inf)
    dim_centers = [(40, 40), (40, 120), (120, 40)]
    for (r, c) in dim_centers:
        assert y_clip[r, c] > 0
    # clipping must strictly raise the dim-nucleus offsets vs no clipping
    assert all(y_clip[r, c] > y_noclip[r, c] - 1e-6 for r, c in dim_centers)
    assert sum(y_clip[r, c] for r, c in dim_centers) > \
        sum(y_noclip[r, c] for r, c in dim_centers)
