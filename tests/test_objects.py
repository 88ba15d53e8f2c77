"""Unit tests for objects (mirrors reference ``tests/test_objects.py``)."""

import numpy as np

from superdsm_tpu.objects import BaseObject, Object, extract_foreground_fragment
from superdsm_tpu.image import Image


def test_fill_foreground():
    obj = BaseObject()
    obj.fg_fragment = np.array([[False, True],
                                [True, True],
                                [True, False]])
    obj.fg_offset = (1, 2)
    actual = np.zeros((4, 5), bool)
    obj.fill_foreground(actual)
    expected = np.array([[False, False, False, False, False],
                         [False, False, False, True, False],
                         [False, False, True, True, False],
                         [False, False, True, False, False]])
    np.testing.assert_allclose(actual, expected)


def test_get_mask():
    atoms = np.array([[1, 1, 2],
                      [1, 3, 2],
                      [3, 3, 3]])
    obj = Object()
    obj.footprint = set([2, 3])
    expected = np.array([[False, False, True],
                         [False, True, True],
                         [True, True, True]])
    np.testing.assert_allclose(obj.get_mask(atoms), expected)


def test_extract_foreground_fragment():
    mask = np.array([[False, False, False, False, False],
                     [False, False, False, True, False],
                     [False, False, True, True, False],
                     [False, False, True, False, False]])
    offset, fragment = extract_foreground_fragment(mask)
    np.testing.assert_allclose(offset, np.array([1, 2]))
    np.testing.assert_allclose(fragment, np.array([[False, True],
                                                   [True, True],
                                                   [True, False]]))


def test_extract_foreground_fragment_empty():
    offset, fragment = extract_foreground_fragment(np.zeros((3, 3), bool))
    np.testing.assert_allclose(offset, np.zeros(2))
    assert fragment.shape == (1, 1) and not fragment.any()


def test_get_cvxprog_region():
    y_data = np.array([[-1, -1, -1, -1, -1],
                       [-1, -1, -1, -1, -1],
                       [-1, -1, -1, -1, -1],
                       [-1, +1, -1, -1, -1],
                       [-1, +1, -1, -1, +1],
                       [-1, +1, -1, -1, +1]])
    atoms = np.array([[1, 1, 1, 1, 1],
                      [1, 1, 1, 1, 1],
                      [1, 1, 1, 1, 2],
                      [1, 1, 1, 2, 2],
                      [1, 1, 1, 2, 2],
                      [1, 1, 1, 2, 2]])
    obj = Object()
    obj.footprint = set([1])
    y = Image(np.asarray(y_data, float))
    region = obj.get_cvxprog_region(y, atoms, background_margin=2)
    expected = np.array([[False, False, False, False, False],
                         [False, True, False, False, False],
                         [True, True, True, False, False],
                         [True, True, True, False, False],
                         [True, True, True, False, False],
                         [True, True, True, False, False]])
    np.testing.assert_allclose(region.mask, expected)
    np.testing.assert_allclose(region.model, y_data)


def test_cvxprog_api():
    """The reference-compatible cvxprog() entry point fits one region."""
    import numpy as np
    from superdsm_tpu.objects import cvxprog, Energy
    from superdsm_tpu.image import Image
    rr, cc = np.indices((48, 48))
    y = (((rr - 24) ** 2 + (cc - 24) ** 2) < 144).astype(float) - 0.5
    J, model, status = cvxprog(Image(y), smooth_amount=4, smooth_subsample=8,
                               alpha=0.1)
    assert status == 'optimal'
    # J evaluates the same objective the solver minimized (close to it)
    energy = J(model)
    assert np.isfinite(energy)
    s = model.s(np.stack(np.indices((48, 48))).astype(float) / 47.0)
    fg = s > 0
    true = y > 0
    assert (fg & true).sum() / (fg | true).sum() > 0.9


def test_debug_footprint_dump(tmp_path, monkeypatch):
    """SDSM_DEBUG_FOOTPRINT dumps a per-object energy-trace record."""
    import json
    import numpy as np
    from superdsm_tpu.image import Image
    from superdsm_tpu.objects import Object, compute_objects

    H, W = 32, 32
    rr, cc = np.indices((H, W))
    disk = ((rr - 16.0) ** 2 + (cc - 16.0) ** 2) <= 8.0 ** 2
    y = Image(model=disk.astype(np.float32) - 0.5)
    atoms = disk.astype(int)
    obj = Object()
    obj.footprint = frozenset([1])
    monkeypatch.setenv('SDSM_DEBUG_FOOTPRINT', '1')
    dsm_cfg = {'smooth_amount': 4, 'smooth_subsample': 6, 'alpha': 0.05,
               'background_margin': 6, 'newton_maxiter': 8}
    compute_objects([obj], y, atoms, dsm_cfg, log_root_dir=str(tmp_path))
    record_path = tmp_path / 'debug_object_1.json'
    assert record_path.exists()
    record = json.loads(record_path.read_text())
    assert record['footprint'] == [1]
    assert len(record['energy_trace']) >= 2
    energies = [t['energy'] for t in record['energy_trace']]
    assert energies[-1] <= energies[0] + 1e-6  # monotone-ish trace


def test_compute_objects_dedups_identical_cold_footprints(monkeypatch):
    """A single-atom cluster's universe is the same region as its atom: one
    solve must serve both (round-4 dedup; halves the first gem batch on
    dense fields), while warm-started duplicates keep their own solve."""
    import superdsm_tpu.objects as O
    from superdsm_tpu.image import Image
    from superdsm_tpu.objects import Object, compute_objects

    H, W = 32, 32
    rr, cc = np.indices((H, W))
    disk = ((rr - 16.0) ** 2 + (cc - 16.0) ** 2) <= 8.0 ** 2
    y = Image(model=disk.astype(np.float32) - 0.5)
    atoms = disk.astype(int)
    dsm_cfg = {'smooth_amount': 4, 'smooth_subsample': 6, 'alpha': 0.05,
               'background_margin': 6, 'newton_maxiter': 8}

    solved_counts = []
    real_solve = O.solve_problems

    def counting_solve(problems, **kwargs):
        solved_counts.append(len(problems))
        return real_solve(problems, **kwargs)

    monkeypatch.setattr(O, 'solve_problems', counting_solve)

    atom, universe = Object(), Object()
    atom.footprint = frozenset([1])
    universe.footprint = {1}
    compute_objects([atom, universe], y, atoms, dsm_cfg)
    assert solved_counts == [1]
    assert universe.energy == atom.energy
    assert universe.is_optimal == atom.is_optimal
    assert np.array_equal(universe.fg_fragment, atom.fg_fragment)
    # aliased fragments must be independent copies (postprocess mutates)
    assert universe.fg_fragment is not atom.fg_fragment

    # a warm-started duplicate keeps its own solve
    child = Object()
    child.footprint = {1}
    child.init_from = atom
    other = Object()
    other.footprint = {1}
    solved_counts.clear()
    compute_objects([child, other], y, atoms, dsm_cfg)
    assert solved_counts == [2]
