"""Tests for image file I/O."""

import numpy as np
import pytest

from superdsm_tpu.io import imread, imsave


def test_roundtrip_uint8(tmp_path):
    img = (np.random.RandomState(0).rand(20, 30) * 255).astype(np.uint8)
    path = tmp_path / 'img.png'
    imsave(str(path), img)
    back = imread(str(path))
    np.testing.assert_array_equal(back, img)


def test_float_normalization(tmp_path):
    img = np.linspace(0, 1, 600).reshape(20, 30)
    path = tmp_path / 'img.png'
    imsave(str(path), img, normalize=True)
    back = imread(str(path))
    assert back.min() == 0 and back.max() == 255


def test_bool_mask(tmp_path):
    mask = np.zeros((10, 10), bool)
    mask[3:7, 3:7] = True
    path = tmp_path / 'mask.png'
    imsave(str(path), mask)
    back = imread(str(path))
    assert set(np.unique(back)) == {0, 255}


def test_label_map_uint16(tmp_path):
    labels = np.zeros((10, 10), np.uint16)
    labels[2:5, 2:5] = 300  # exceeds uint8
    path = tmp_path / 'labels.png'
    imsave(str(path), labels)
    back = imread(str(path))
    assert back.max() == 300


def test_rgb_to_gray(tmp_path):
    rgb = np.zeros((8, 8, 3), np.uint8)
    rgb[..., 1] = 200
    path = tmp_path / 'rgb.png'
    imsave(str(path), rgb)
    gray = imread(str(path), as_gray=True)
    assert gray.ndim == 2
    assert gray.mean() == pytest.approx(200 * 0.7154, rel=0.01)


def test_unknown_extension(tmp_path):
    with pytest.raises(ValueError):
        imread(str(tmp_path / 'file.xyz'))
