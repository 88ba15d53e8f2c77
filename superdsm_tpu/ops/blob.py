"""Determinant-of-Hessian blob detection on device.

Counterpart of the reference's masked ``blob_doh`` variant
(``/root/reference/superdsm/automation.py:13-38``, itself based on
scikit-image's SURF-style box-filter approximation over an integral image).
Here the scale-normalized Hessian determinant is computed *analytically* via
separable Gaussian-derivative convolutions on the device:

    DoH(x; sigma) = sigma^4 (L_xx L_yy - L_xy^2),   L = G_sigma * image

which is the quantity the box filters approximate. The LoG-negativity masks
(bright-blob selection) come from the same convolutions at no extra cost.
Peak finding in the (row, col, sigma) cube and overlap pruning follow the
scikit-image semantics (3x3x3 local maxima, pairwise disk-overlap pruning).
"""

import functools
import math

import numpy as np
import scipy.ndimage as ndi
import jax
import jax.numpy as jnp

from .gaussian import gaussian_kernel1d, _pad_symmetric


def _gaussian_derivative_kernels(sigma, truncate=4.0):
    """Returns sampled (g, g', g'') 1D kernels for the given sigma."""
    radius = int(truncate * float(sigma) + 0.5)
    x = np.arange(-radius, radius + 1).astype(np.float64)
    g = np.exp(-0.5 * (x / sigma) ** 2)
    g /= g.sum()
    g1 = -x / sigma ** 2 * g
    g2 = (x ** 2 - sigma ** 2) / sigma ** 4 * g
    return (g.astype(np.float32), g1.astype(np.float32), g2.astype(np.float32))


def _conv_sep(x, krow, kcol):
    """Separable 2D convolution with symmetric boundary handling."""
    radius_r = (len(krow) - 1) // 2
    radius_c = (len(kcol) - 1) // 2
    x = _pad_symmetric(x, radius_r, 0)
    x = _pad_symmetric(x, radius_c, 1)
    kr = jnp.asarray(krow).reshape(1, 1, -1, 1)
    kc = jnp.asarray(kcol).reshape(1, 1, 1, -1)
    out = jax.lax.conv_general_dilated(x[None, None], kr, (1, 1), 'VALID',
                                       preferred_element_type=x.dtype)
    out = jax.lax.conv_general_dilated(out, kc, (1, 1), 'VALID',
                                       preferred_element_type=x.dtype)
    return out[0, 0]


#: Largest sigma evaluated at full resolution. Larger scales are computed on
#: a 2^k-downsampled octave with sigma/2^k (scale-normalized derivatives are
#: invariant under this rescaling), which keeps every convolution kernel
#: small: a direct conv at sigma=141 (radius-200 blobs) would need ~1100
#: taps per axis and compiles pathologically slowly, while the octave
#: version bounds kernels at ~80 taps. Peak localization quantizes to 2^k
#: pixels — negligible against blob radius ~ 2.8 sigma at those scales.
SIGMA_OCTAVE_MAX = 10.0


def _downsample2(x):
    """2x2 mean pooling (octave step; the preceding octave's Gaussian blur
    acts as the antialias filter)."""
    H2, W2 = (x.shape[0] // 2) * 2, (x.shape[1] // 2) * 2
    x = x[:H2, :W2]
    return (x[0::2, 0::2] + x[0::2, 1::2] + x[1::2, 0::2] + x[1::2, 1::2]) * 0.25


def _octave_of(sigma):
    k = 0
    while sigma > SIGMA_OCTAVE_MAX:
        sigma /= 2.0
        k += 1
    return k, sigma


@functools.partial(jax.jit, static_argnames=('sigmas',))
def _doh_response(img, sigmas):
    """Scale-normalized DoH responses and LoGs for a static tuple of sigmas
    in ONE device program (one compile per image shape, one fetch per image;
    the per-sigma version paid both per sigma). Returns two (S, H, W) cubes
    at full resolution; octave-computed levels are nearest-upsampled."""
    H, W = img.shape
    levels = [img]
    dohs, logs = [], []
    for sigma in sigmas:
        k, s_eff = _octave_of(float(sigma))
        while len(levels) <= k:
            levels.append(_downsample2(levels[-1]))
        x = levels[k]
        g, g1, g2 = _gaussian_derivative_kernels(s_eff)
        Lxx = _conv_sep(x, g2, g)
        Lyy = _conv_sep(x, g, g2)
        Lxy = _conv_sep(x, g1, g1)
        doh = (s_eff ** 4) * (Lxx * Lyy - Lxy * Lxy)
        log = (Lxx + Lyy)
        if k:
            doh = jax.image.resize(doh, (H, W), 'nearest')
            log = jax.image.resize(log, (H, W), 'nearest')
        dohs.append(doh)
        logs.append(log)
    return jnp.stack(dohs), jnp.stack(logs)


def _prune_blobs(blobs, overlap):
    """Removes the lower-response blob of every overlapping pair
    (disk-overlap semantics of skimage ``_prune_blobs``)."""
    if len(blobs) == 0:
        return blobs
    order = np.argsort(-blobs[:, 3])
    blobs = blobs[order]
    keep = np.ones(len(blobs), bool)
    for i in range(len(blobs)):
        if not keep[i]:
            continue
        for j in range(i + 1, len(blobs)):
            if not keep[j]:
                continue
            r1 = blobs[i, 2] * math.sqrt(2)
            r2 = blobs[j, 2] * math.sqrt(2)
            d = np.linalg.norm(blobs[i, :2] - blobs[j, :2])
            if d > r1 + r2:
                continue
            if d <= abs(r1 - r2):
                frac = 1.0
            else:
                # area of lens intersection over smaller disk area
                r1sq, r2sq, dsq = r1 ** 2, r2 ** 2, d ** 2
                alpha1 = math.acos(np.clip((dsq + r1sq - r2sq) / (2 * d * r1), -1, 1))
                alpha2 = math.acos(np.clip((dsq + r2sq - r1sq) / (2 * d * r2), -1, 1))
                area = (r1sq * (alpha1 - math.sin(2 * alpha1) / 2)
                        + r2sq * (alpha2 - math.sin(2 * alpha2) / 2))
                frac = area / (math.pi * min(r1sq, r2sq))
            if frac > overlap:
                keep[j] = False
    return blobs[keep]


def blob_doh(image, sigma_list, threshold=0.01, overlap=0.5, log_mask=True):
    """Detects bright blobs; returns an (N, 4) array of
    ``(row, col, sigma, response)`` sorted by decreasing response.

    :param log_mask: Restrict detections to LoG-negative areas per sigma
        (the reference's bright-blob masking,
        ``/root/reference/superdsm/automation.py:52``).
    """
    img = jnp.asarray(np.asarray(image, np.float32))
    dohs, logs = _doh_response(img, tuple(float(s) for s in sigma_list))
    dohs, logs = jax.device_get((dohs, logs))
    if log_mask:
        dohs = dohs * (logs < 0)
    cube = np.moveaxis(dohs, 0, -1)
    footprint = np.ones((3, 3, 3), bool)
    local_max = (ndi.maximum_filter(cube, footprint=footprint, mode='constant') == cube)
    local_max &= cube > threshold
    coords = np.argwhere(local_max)
    if coords.size == 0:
        return np.empty((0, 4))
    blobs = np.zeros((len(coords), 4))
    blobs[:, :2] = coords[:, :2]
    blobs[:, 2] = np.asarray(sigma_list)[coords[:, 2]]
    blobs[:, 3] = cube[coords[:, 0], coords[:, 1], coords[:, 2]]
    return _prune_blobs(blobs, overlap)
