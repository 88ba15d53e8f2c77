"""Tests for rendering and label rasterization."""

import numpy as np

from superdsm_tpu.render import (draw_line, rasterize_regions, rasterize_labels,
                                 shuffle_labels, colorize_labels, normalize_image,
                                 render_ymap, ContourPaint)
from superdsm_tpu.objects import BaseObject


def _obj(offset, fragment):
    o = BaseObject()
    o.fg_offset = np.asarray(offset)
    o.fg_fragment = np.asarray(fragment, bool)
    return o


def test_draw_line_connects_endpoints():
    mask = draw_line((2, 2), (2, 17), 3, (20, 20))
    assert mask[2, 2] > 0 and mask[2, 17] > 0
    assert mask[2, 10] > 0
    assert mask[10, 10] == 0


def test_rasterize_regions_borders():
    regions = np.zeros((20, 20), int)
    regions[5:15, 5:15] = 1
    borders, background = rasterize_regions(regions, background_label=0, radius=1)
    assert borders[5, 5] and borders[5, 10]
    assert not borders[10, 10]
    assert background[0, 0] and not background[10, 10]


def test_rasterize_labels_disjoint():
    data = {'g_raw': np.zeros((20, 20))}
    objs = [_obj((2, 2), np.ones((5, 5))), _obj((10, 10), np.ones((6, 6)))]
    labels = rasterize_labels(data, objs)
    assert set(np.unique(labels)) == {0, 1, 2}
    assert (labels[2:7, 2:7] > 0).all()


def test_rasterize_labels_overlap_resolved():
    data = {'g_raw': np.zeros((20, 20))}
    objs = [_obj((2, 2), np.ones((8, 8))), _obj((6, 6), np.ones((8, 8)))]
    labels = rasterize_labels(data, objs)
    # overlap assigned to exactly one object per pixel, nothing lost
    assert (labels[np.s_[2:10], np.s_[2:10]] > 0).any()
    total_fg = ((labels > 0).sum())
    union = np.zeros((20, 20), bool)
    for o in objs:
        o.fill_foreground(union)
    assert total_fg == union.sum()


def test_rasterize_labels_merge_threshold():
    data = {'g_raw': np.zeros((20, 20))}
    big = np.ones((8, 8))
    objs = [_obj((2, 2), big), _obj((3, 3), big[:-1, :-1])]  # heavy overlap
    labels = rasterize_labels(data, objs, merge_overlap_threshold=0.5)
    assert labels.max() == 1  # merged into one object


def test_rasterize_labels_identical_objects_restored():
    data = {'g_raw': np.zeros((12, 12))}
    objs = [_obj((2, 2), np.ones((4, 4))), _obj((2, 2), np.ones((4, 4)))]
    labels = rasterize_labels(data, objs)
    assert (labels[2:6, 2:6] > 0).all()


def test_shuffle_labels_preserves_partition():
    labels = np.array([[0, 1, 1], [2, 2, 0]])
    shuffled = shuffle_labels(labels, bg_label=0, seed=42)
    assert (shuffled == 0).sum() == 2
    assert len(np.unique(shuffled)) == 3


def test_colorize_labels_shape():
    labels = np.array([[0, 1], [2, 2]])
    img = colorize_labels(labels)
    assert img.shape == (2, 2, 3)
    np.testing.assert_allclose(img[0, 0], (0, 0, 0))


def test_normalize_image_clips():
    rng = np.random.RandomState(0)
    img = rng.randn(50, 50)
    out = normalize_image(img)
    assert out.min() == 0 and out.max() == 1


def test_render_ymap_shape():
    y = np.random.RandomState(0).randn(30, 40)
    ymap = render_ymap({'y': y})
    assert ymap.shape == (30, 40, 3)


def test_contour_paint_center():
    mask = np.zeros((20, 20), bool)
    mask[5:15, 5:15] = True
    cp = ContourPaint(mask, radius=1, where='center')
    contour = cp.get_contour_mask(mask)
    assert contour[5, 10] and contour[4, 10]
    assert not contour[10, 10]
