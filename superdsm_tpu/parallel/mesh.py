"""Device mesh construction helpers."""

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_batch=None, n_pixel=1, devices=None, axis_names=('batch', 'pixel')):
    """Builds a 2D ``(batch, pixel)`` mesh over the given devices.

    :param n_batch: Devices along the batch (data-parallel) axis; defaults to
        ``len(devices) // n_pixel``.
    :param n_pixel: Devices along the pixel (region-sharding) axis.
    """
    if devices is None:
        devices = jax.devices()
    if n_batch is None:
        n_batch = len(devices) // n_pixel
    assert n_batch * n_pixel <= len(devices), \
        f'mesh {n_batch}x{n_pixel} needs more than {len(devices)} devices'
    dev_array = np.asarray(devices[:n_batch * n_pixel]).reshape(n_batch, n_pixel)
    return Mesh(dev_array, axis_names)


def default_mesh():
    """All local devices on the batch axis."""
    return make_mesh(n_pixel=1)
