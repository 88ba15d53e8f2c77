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

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

from .pipeline import Stage
from .ops.gaussian import _gaussian_filter_2d
from .ops.edt import edt


@functools.partial(jax.jit,
                   static_argnames=('sigma1', 'sigma2', 'lower_clip_mean'))
def _preprocess_program(gq, gscale, blendq, offset_clip_abs, gmean,
                        sigma1, sigma2, lower_clip_mean):
    """The whole offset computation as ONE device program.

    Through a remote-device tunnel every eager jnp op is a dispatch
    (~25-30 ms) and host<->device bandwidth is scarce, so the image travels
    up uint16-quantized, all three Gaussian filters + the blend run fused,
    and the offsets come back int16-quantized (same format as the solver's
    packed transfers; quantization error ~3e-5 of the range is far below the
    imaging noise)."""
    g = gq.astype(jnp.float32) * gscale
    offset_original = _gaussian_filter_2d(g, (sigma2, sigma2), 4.0)
    if blendq is None:
        offset_combined = offset_original
    else:
        blend = blendq.astype(jnp.float32) * (1.0 / 65535.0)
        offset_clipped = _gaussian_filter_2d(
            jnp.clip(g, 0, offset_clip_abs), (sigma2, sigma2), 4.0)
        offset_combined = (1 - blend) * offset_clipped + blend * offset_original
    if lower_clip_mean:
        offset_combined = jnp.maximum(offset_combined, gmean)
    y = _gaussian_filter_2d(g, (sigma1, sigma1), 4.0) - offset_combined
    yscale = jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)
    yq = jnp.round(y * (32767.0 / yscale)).astype(jnp.int16)
    return yq, yscale


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

        # uint16 quantization of the (normalized, non-negative) intensities
        gmax = float(g_raw.max())
        gq_scale = np.float32((gmax if gmax > 0 else 1.0) / 65535.0)
        gq = np.round(g_raw * (1.0 / gq_scale)).astype(np.uint16)

        if np.isinf(offset_clip):
            blendq = None
            offset_clip_abs = np.float32(0)
        else:
            offset_clip_abs = offset_clip * float(g_raw.std())
            clip_area = (g_raw > offset_clip_abs)
            blend = edt(~clip_area)
            blend = np.clip(sigma2 - blend, 0, np.inf)
            bmax = blend.max()
            blend = (blend / (bmax if bmax > 0 else 1)) ** 2
            blendq = np.round(blend * 65535.0).astype(np.uint16)

        yq, yscale = jax.device_get(_preprocess_program(
            gq, gq_scale, blendq, np.float32(offset_clip_abs),
            np.float32(g_raw.mean()), float(sigma1), float(sigma2),
            bool(lower_clip_mean)))
        y = yq.astype(np.float64) * (float(yscale) / 32767.0)

        return {
            'y': y,
        }

    def configure_ex(self, scale, radius, diameter):
        return {
            'sigma2': (scale, 1.0),
        }
