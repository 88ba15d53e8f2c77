"""Decision-quantization helpers (superdsm_tpu._stability).

The quantizer underlies every discrete segmentation decision; its contract
(idempotent, monotone, sign-symmetric, grid ~2^-BITS relative) is what makes
sub-grid recompile drift unable to reorder quantized comparisons.
"""

import math

import numpy as np
import pytest

from superdsm_tpu._stability import BITS, dq, fp_order


def test_dq_idempotent_and_special_values():
    rng = np.random.RandomState(0)
    for x in rng.randn(200) * 10.0 ** rng.randint(-6, 6, 200):
        assert dq(dq(x)) == dq(x)
    assert dq(0.0) == 0.0
    assert dq(math.inf) == math.inf
    assert dq(-math.inf) == -math.inf
    assert math.isnan(dq(math.nan))


def test_dq_monotone():
    rng = np.random.RandomState(1)
    xs = np.sort(rng.randn(500) * 10.0 ** rng.randint(-4, 4, 500))
    qs = [dq(x) for x in xs]
    assert all(a <= b for a, b in zip(qs, qs[1:]))


def test_dq_relative_grid():
    for x in (1.0, -1.0, 3.7, 123.456, 1e-8, 2.0 ** 40):
        assert abs(dq(x) - x) <= abs(x) * 2.0 ** -BITS
        # drift below half a grid step cannot change the quantized value
        # unless the value sits on a cell boundary
        assert dq(x * (1 + 2.0 ** -(BITS + 4))) in (dq(x), dq(x * (1 + 2.0 ** -BITS)))


def test_dq_sign_symmetric():
    for x in (1.0, 3.3, 17.0, 0.1):
        assert dq(-x) == -dq(x)


def test_dq_collapses_subgrid_gaps():
    """Two values within a tiny relative gap quantize identically (the
    near-tie → exact-tie conversion the greedy tie-breaks rely on) for
    almost all anchor points."""
    rng = np.random.RandomState(2)
    xs = rng.uniform(1.0, 100.0, 1000)
    eps = 2.0 ** -(BITS + 6)
    collapsed = sum(dq(x) == dq(x * (1 + eps)) for x in xs)
    assert collapsed >= 950  # only values at a grid edge may differ


def test_fp_order_deterministic():
    class Obj:
        def __init__(self, fp):
            self.footprint = fp
    assert fp_order(Obj(frozenset({3, 1, 2}))) == (1, 2, 3)
    assert fp_order(Obj({5})) == (5,)


def test_quant_disabled_by_env(monkeypatch):
    import importlib
    import superdsm_tpu._stability as st
    monkeypatch.setenv('SDSM_DECISION_QUANT_BITS', '0')
    importlib.reload(st)
    try:
        assert st.dq(1.2345678901234) == 1.2345678901234
    finally:
        monkeypatch.undo()
        importlib.reload(st)
