"""Tests for min-weight set cover and max-weight set packing."""

import numpy as np

from superdsm_tpu.objects import Object
from superdsm_tpu.minsetcover import solve_minsetcover, MinSetCover
from superdsm_tpu.maxsetpack import solve_maxsetpack
from superdsm_tpu.atoms import AtomAdjacencyGraph
from superdsm_tpu.output import get_output


def _obj(footprint, energy):
    o = Object()
    o.footprint = set(footprint)
    o.energy = energy
    o.is_optimal = True
    return o


MUTED = get_output(None).derive(muted=True)


def test_minsetcover_prefers_cheap_merge():
    # two atoms; merged object cheaper than the two singletons + extra beta
    a1 = _obj({1}, 10.0)
    a2 = _obj({2}, 10.0)
    merged = _obj({1, 2}, 12.0)
    beta = 10.0
    solution = solve_minsetcover([a1, a2, merged], beta, out=MUTED)
    assert {frozenset(c.footprint) for c in solution} == {frozenset({1, 2})}


def test_minsetcover_prefers_singletons_when_merge_expensive():
    a1 = _obj({1}, 1.0)
    a2 = _obj({2}, 1.0)
    merged = _obj({1, 2}, 100.0)
    solution = solve_minsetcover([a1, a2, merged], 0.1, out=MUTED)
    assert {frozenset(c.footprint) for c in solution} == {frozenset({1}), frozenset({2})}


def test_maxsetpack_greedy():
    objs = [_obj({1, 2}, 5.0), _obj({2, 3}, 4.0), _obj({3, 4}, 3.0)]
    picked = solve_maxsetpack(objs, out=MUTED)
    assert {frozenset(c.footprint) for c in picked} == {frozenset({1, 2}), frozenset({3, 4})}


def test_minsetcover_incremental_update():
    atoms_map = np.array([[1, 2]])
    clusters = np.array([[1, 1]])
    fg = np.ones((1, 2), bool)
    adj = AtomAdjacencyGraph(atoms_map, clusters, fg, [(0, 0), (0, 1)], out=MUTED)
    a1 = _obj({1}, 5.0)
    a2 = _obj({2}, 5.0)
    cover = MinSetCover([a1, a2], beta=4.0, adjacencies=adj)
    assert cover.costs == 5 + 5 + 2 * 4
    merged = _obj({1, 2}, 11.0)
    cover.update([merged], MUTED)
    assert cover.costs == 11 + 4
    assert {frozenset(c.footprint) for c in cover.solution} == {frozenset({1, 2})}
    assert cover.get_atom(1) is a1
    assert cover.get_cluster_costs(1) == 15
