"""The bit-packed mask transfer's row-major precondition guard.

The packed format collapses ``Problem.pts`` into a crop bitmask; the device
decode rebuilds coordinates argwhere-sorted while ``yv``/``init_params`` keep
the given order, so a Problem whose ``pts`` is unsorted or duplicated MUST
route to the explicit-coordinate path (``fits_mask`` returns False) — the
mask path would silently pair pixels with other pixels' intensities.
"""

import numpy as np

from superdsm_tpu.dsm.batching import Problem
from superdsm_tpu.dsm.solver import MASK_BITS_PER_PIXEL


def _problem(pts):
    pts = np.asarray(pts, np.int32)
    n = len(pts)
    return Problem(pts=pts, offset=np.zeros(2, np.int32), img_shape=(64, 64),
                   yv=np.linspace(-1, 1, n, dtype=np.float32),
                   sub=np.zeros((0, 2), np.int32))


def _grid_pts(h, w):
    rr, cc = np.indices((h, w))
    return np.stack([rr.ravel(), cc.ravel()], axis=1)


def test_fits_mask_accepts_rowmajor():
    p = _problem(_grid_pts(8, 8))
    assert p.fits_mask(2048)
    # and the packed mask round-trips exactly
    m = np.unpackbits(p.packed_mask, count=p.crop_area).astype(bool)
    assert m.all() and m.size == 64


def test_fits_mask_rejects_capacity():
    p = _problem(_grid_pts(4, 4))
    p.crop_shape = (1024, 1024)  # sparse mask: bbox bits exceed the buffer
    assert p.crop_area > 2048 * MASK_BITS_PER_PIXEL
    assert not p.fits_mask(2048)


def test_fits_mask_rejects_unsorted():
    pts = _grid_pts(8, 8)[::-1]  # reversed row-major order
    assert not _problem(pts).fits_mask(2048)


def test_fits_mask_rejects_duplicates():
    pts = _grid_pts(8, 8)
    pts[1] = pts[0]
    assert not _problem(pts).fits_mask(2048)


def test_fits_mask_rejects_out_of_crop():
    pts = _grid_pts(8, 8)
    p = _problem(pts)
    p.crop_shape = (8, 4)  # half the points fall outside the declared crop
    assert not p.fits_mask(2048)
