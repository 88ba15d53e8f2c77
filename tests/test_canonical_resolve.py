"""Canonical re-solve of non-converged DSM lanes (VERDICT r4 item 2).

Truncated (LM-stalling) solves are trajectory snapshots whose energies used
to depend on the runtime bucket ladder and chunk shapes; re-solving exactly
those lanes at a FROZEN canonical shape makes their energies a pure
function of the problem. Measured basis: a lane's trajectory is bitwise
independent of the other lanes' data and of lane order, but depends on the
program shape (``tools/probe_packing_invariance.py``).

A maxiter below a problem's natural convergence point reliably produces
truncated (conv=False) lanes — the two-blob fields below converge at ~3
iterations, so ``maxiter=2`` flags every lane.
"""

import numpy as np
import pytest

from superdsm_tpu.dsm import batching
from superdsm_tpu.dsm.batching import Problem, solve_problems

MAXITER = 2


def _random_problems(n, seed=0, img_shape=(96, 96)):
    rng = np.random.RandomState(seed)
    problems = []
    for i in range(n):
        H, W = 56 + i, 60
        mask = rng.rand(H, W) > 0.35
        pts = np.ascontiguousarray(np.argwhere(mask).astype(np.int16))
        yv = (np.exp(-((pts[:, 0] - 18) ** 2 + (pts[:, 1] - 20) ** 2) / 60.0)
              + np.exp(-((pts[:, 0] - 38) ** 2 + (pts[:, 1] - 40) ** 2) / 60.0)
              - 0.12 + rng.randn(len(pts)) * 0.02).astype(np.float32)
        sub = np.ascontiguousarray(
            np.argwhere(np.ones((6, 6), bool)).astype(np.int32) * 9)
        problems.append(Problem(pts=pts, offset=np.zeros(2, np.int32),
                                img_shape=img_shape, yv=yv, sub=sub, tag=i))
    return problems


def _energies(results):
    return {r.tag: r.energy for r in results}


def test_flagged_lane_energies_survive_ladder_repack(monkeypatch):
    """The done-criterion of the un-pinned ladder: dropping a bucket (the
    SDSM_DROP_BUCKETS A/B class) must leave every canonically re-solved
    lane's energy EXACTLY unchanged, and every converged lane within the
    small repack-drift class the dq() grid absorbs."""
    problems = _random_problems(6)
    res_a = solve_problems(problems, maxiter=MAXITER)
    flagged_a = set(batching._LAST_FLAGGED)
    assert flagged_a, 'expected LM-stalling lanes at maxiter=MAXITER'
    e_a = _energies(res_a)

    # repack: remove the bucket these problems land in (3000-4000 px ->
    # 6144), forcing them into the next one
    monkeypatch.setattr(batching, 'P_BUCKETS',
                        [pb for pb in batching.P_BUCKETS if pb != 6144])
    res_b = solve_problems(problems, maxiter=MAXITER)
    flagged_b = set(batching._LAST_FLAGGED)
    e_b = _energies(res_b)

    assert flagged_a == flagged_b, 'flagging must not depend on the ladder'
    for tag in flagged_a:
        assert e_a[tag] == e_b[tag], \
            f'canonical lane {tag} drifted under repack: {e_a[tag]} vs {e_b[tag]}'
    for tag in set(e_a) - flagged_a:
        assert e_a[tag] == pytest.approx(e_b[tag], rel=1e-3), \
            f'converged lane {tag} drifted beyond the dq class'


def test_flagged_lane_energy_independent_of_batch_composition():
    """A flagged problem solved alone must get the SAME canonical energy it
    gets inside a full batch — the canonical energy is a function of the
    problem only."""
    problems = _random_problems(6)
    res_all = solve_problems(problems, maxiter=MAXITER)
    flagged = set(batching._LAST_FLAGGED)
    assert flagged
    tag = sorted(flagged)[0]
    p = next(p for p in problems if p.tag == tag)
    res_solo = solve_problems([p], maxiter=MAXITER)
    assert batching._LAST_FLAGGED == [tag]
    assert _energies(res_all)[tag] == res_solo[0].energy


def test_canonical_accounting_and_kill_switch(monkeypatch):
    problems = _random_problems(4, seed=1)
    acct0 = batching.device_accounting()
    solve_problems(problems, maxiter=MAXITER)
    acct1 = batching.device_accounting()
    assert acct1['canonical_lanes'] > acct0['canonical_lanes']

    monkeypatch.setattr(batching, '_CANONICAL_RESOLVE', False)
    solve_problems(problems, maxiter=MAXITER)
    assert batching._LAST_FLAGGED == []
    acct2 = batching.device_accounting()
    assert acct2['canonical_lanes'] == acct1['canonical_lanes']
