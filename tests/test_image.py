"""Unit tests for image utilities (mirrors reference ``tests/test_image.py``)."""

import numpy as np

from superdsm_tpu.image import get_pixel_map, bbox, normalize_image, Image


def test_get_pixel_map():
    actual1 = get_pixel_map((5, 5))
    actual2 = get_pixel_map((5, 5), normalized=True)
    expected = np.stack(np.indices((5, 5))).astype(float)
    np.testing.assert_allclose(actual1, expected)
    np.testing.assert_allclose(actual2, expected / 4)


def test_bbox():
    mask = np.array([[0, 0, 0, 0, 0],
                     [0, 0, 0, 1, 0],
                     [0, 0, 1, 1, 0],
                     [0, 0, 1, 0, 0]]).astype(bool)
    actual1 = bbox(mask)
    actual2 = bbox(mask, include_end=True)
    np.testing.assert_allclose(actual1[0], np.array([[1, 4], [2, 4]]))
    np.testing.assert_allclose(actual2[0], np.array([[1, 3], [2, 3]]))
    assert actual1[1] == (slice(1, 4), slice(2, 4))
    assert actual2[1] == (slice(1, 3), slice(2, 3))


def test_normalize_image():
    img = np.array([[2.0, 4.0], [6.0, 10.0]])
    out = normalize_image(img)
    assert out.min() == 0 and out.max() == 1
    np.testing.assert_allclose(out, (img - 2) / 8)


def test_image_get_region_shrink():
    model = np.arange(20).reshape(4, 5).astype(float)
    img = Image(model=model)
    mask = np.zeros((4, 5), bool)
    mask[1:3, 2:4] = True
    region = img.get_region(mask, shrink=True)
    assert region.model.shape == (2, 2)
    assert region.offset == (1, 2)
    np.testing.assert_allclose(region.model, model[1:3, 2:4])
    assert region.full_mask.shape == (4, 5)
