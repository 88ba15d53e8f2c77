"""Stage 1: intensity offsets (preprocessing).

Computes the offset image intensities ``y = G_sigma1(g) - tau`` where ``tau``
is a clipped Gaussian background estimate blended near bright areas —
semantics of ``/root/reference/superdsm/preprocess.py:39-68`` — with the
Gaussian filtering fused on device (XLA) and the EDT-based blend on device as
well for large images.

Hyperparameters (namespace ``preprocess``): ``sigma1`` (default sqrt(2)),
``sigma2`` (default 40, auto ``AF_sigma2 * scale``), ``offset_clip``
(default 3), ``lower_clip_mean`` (default False).
"""

import math

import numpy as np
import jax.numpy as jnp

from .pipeline import Stage
from .ops.gaussian import gaussian_filter
from .ops.edt import edt


class Preprocessing(Stage):

    ENABLED_BY_DEFAULT = True

    def __init__(self):
        super().__init__('preprocess', inputs=['g_raw'], outputs=['y'])

    def process(self, input_data, cfg, out, log_root_dir):
        g_raw = np.asarray(input_data['g_raw'], np.float32)

        sigma1 = cfg.get('sigma1', math.sqrt(2))
        sigma2 = cfg.get('sigma2', 40)
        offset_clip = cfg.get('offset_clip', 3)
        lower_clip_mean = cfg.get('lower_clip_mean', False)

        g = jnp.asarray(g_raw)
        offset_original = gaussian_filter(g, sigma2)

        if np.isinf(offset_clip):
            offset_combined = offset_original
        else:
            offset_clip_abs = offset_clip * float(g_raw.std())
            offset_clipped = gaussian_filter(jnp.clip(g, 0, offset_clip_abs), sigma2)
            clip_area = (g_raw > offset_clip_abs)
            blend = edt(~clip_area)
            blend = np.clip(sigma2 - blend, 0, np.inf)
            bmax = blend.max()
            blend = (blend / (bmax if bmax > 0 else 1)) ** 2
            blend = jnp.asarray(blend.astype(np.float32))
            offset_combined = (1 - blend) * offset_clipped + blend * offset_original

        if lower_clip_mean:
            offset_combined = jnp.maximum(offset_combined, float(g_raw.mean()))

        y = gaussian_filter(g, sigma1) - offset_combined

        return {
            'y': np.asarray(y, np.float64),
        }

    def configure_ex(self, scale, radius, diameter):
        return {
            'sigma2': (scale, 1.0),
        }
