"""Tests for the segmentation metrics."""

import numpy as np

from superdsm_tpu.metrics import dice, seg_score, object_based_f1


def _labels(*boxes, shape=(20, 20)):
    out = np.zeros(shape, int)
    for label, (r0, r1, c0, c1) in enumerate(boxes, 1):
        out[r0:r1, c0:c1] = label
    return out


def test_dice_perfect():
    a = _labels((2, 8, 2, 8))
    assert dice(a, a) == 1.0


def test_dice_disjoint():
    a = _labels((0, 5, 0, 5))
    b = _labels((10, 15, 10, 15))
    assert dice(a, b) == 0.0


def test_seg_score_matching():
    gt = _labels((2, 8, 2, 8), (12, 18, 12, 18))
    pred = _labels((2, 8, 2, 8), (12, 18, 12, 17))
    score = seg_score(pred, gt)
    assert 0.8 < score < 1.0


def test_seg_score_requires_majority():
    gt = _labels((0, 10, 0, 10))
    pred = _labels((8, 10, 0, 10))  # covers only 20% of gt
    assert seg_score(pred, gt) == 0.0


def test_object_f1():
    gt = _labels((2, 8, 2, 8), (12, 18, 12, 18))
    pred = _labels((2, 8, 2, 8))
    res = object_based_f1(pred, gt)
    assert res['matches'] == 1
    assert res['precision'] == 1.0
    assert res['recall'] == 0.5
