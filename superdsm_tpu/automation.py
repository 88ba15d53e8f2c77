"""Automatic hyperparameter configuration from estimated object scale.

Counterpart of the reference's ``superdsm/automation.py``
(``/root/reference/superdsm/automation.py:41-117``): the object scale sigma
is estimated with a masked determinant-of-Hessian blob detector (here the
analytic device implementation in :mod:`superdsm_tpu.ops.blob`), and each
stage's :meth:`~superdsm_tpu.pipeline.Stage.configure` spec is expanded into
``key = factor * AF_key`` config entries with type/min/max clamps.
"""

import math

import numpy as np

from .image import normalize_image
from .ops.blob import blob_doh

_max = max
_min = min


def _estimate_scale(im, min_radius=20, max_radius=200, num_radii=10,
                    thresholds=[0.01], inlier_tol=np.inf):
    """Estimates the object scale sigma of an image
    (semantics of ``/root/reference/superdsm/automation.py:41-68``:
    median-absolute-deviation inlier filtering of detected blob radii, then
    ``scale = mean radius / sqrt(2)``)."""
    sigma_list = np.linspace(min_radius, max_radius, num_radii) / math.sqrt(2)
    sigma_list = np.concatenate([[sigma_list.min() / 2], sigma_list])

    im_norm = normalize_image(im)
    im_norm = im_norm / im_norm.max()

    mean_radius = None
    for threshold in sorted(thresholds, reverse=True):
        blobs = blob_doh(im_norm, sigma_list, threshold=threshold)
        blobs = blobs[~np.isclose(blobs[:, 2], sigma_list.min())]
        if len(blobs) == 0:
            continue

        radii = blobs[:, 2] * math.sqrt(2)
        radii_median = np.median(radii)
        radii_mad = np.mean(np.abs(radii - radii_median))
        radii_inliers = np.logical_and(radii >= radii_median - radii_mad,
                                       radii <= radii_median + radii_mad)
        mean_radius = np.mean(radii[radii_inliers])
        break

    if mean_radius is None:
        raise ValueError('scale estimation failed')
    return mean_radius / math.sqrt(2), blobs, radii_inliers


def _create_config_entry(cfg, key, factor, default_user_factor, type=None, min=None, max=None):
    keys = key.split('/')
    af_key = f'{"/".join(keys[:-1])}/AF_{keys[-1]}'
    cfg.set_default(key, factor * cfg.get(af_key, default_user_factor), True)
    if type is not None:
        cfg.update(key, func=type)
    if min is not None:
        cfg.update(key, func=lambda value: _max((value, min)))
    if max is not None:
        cfg.update(key, func=lambda value: _min((value, max)))


def create_config(pipeline, base_cfg, img):
    """Expands scale-dependent hyperparameter defaults into a new config.

    If ``AF_scale`` is set in ``base_cfg``, that scale is used directly;
    otherwise the scale is estimated from ``img``
    (cf. ``/root/reference/superdsm/automation.py:80-102``).

    :return: ``(cfg, scale)``.
    """
    cfg = base_cfg.copy()
    scale = cfg.get('AF_scale', None)
    if scale is None:
        scale = _estimate_scale(img, num_radii=10, thresholds=[0.01])[0]
    for stage in pipeline.stages:
        specs = stage.configure(scale)
        for key, spec in specs.items():
            assert len(spec) in (2, 3), \
                f'{type(stage).__name__}.configure returned tuple of unknown length ({len(spec)})'
            kwargs = dict() if len(spec) == 2 else spec[-1]
            _create_config_entry(cfg, f'{stage.cfgns}/{key}', *spec[:2], **kwargs)
    return cfg, scale


def process_image(pipeline, base_cfg, g_raw, **kwargs):
    """Segments an image with automatically configured hyperparameters.

    :param pipeline: The :class:`~superdsm_tpu.pipeline.Pipeline` to use.
    :param base_cfg: Custom hyperparameters (:class:`~superdsm_tpu.config.Config`).
    :param g_raw: The raw image.
    :return: Same tuple as :meth:`~superdsm_tpu.pipeline.Pipeline.process_image`.
    """
    cfg, _ = create_config(pipeline, base_cfg, g_raw)
    return pipeline.process_image(g_raw, cfg=cfg, **kwargs)
