"""Unit tests for the atom adjacency graph.

Mirrors the coverage of the reference's ``tests/test_atoms.py``
(same toy fixture and expected adjacency structure).
"""

import numpy as np
import pytest

from superdsm_tpu.atoms import AtomAdjacencyGraph
from superdsm_tpu.output import get_output


@pytest.fixture(scope='module')
def adj():
    atoms = np.array([[1, 1, 2, 4],
                      [1, 3, 2, 4],
                      [3, 3, 3, 4]])
    clusters = np.array([[1, 1, 2, 2],
                         [1, 2, 2, 2],
                         [2, 2, 2, 2]])
    fg_mask = np.array([[True, False, True, False],
                        [True, False, True, True],
                        [True, True, True, True]])
    seeds = [(0, 0), (0, 2), (2, 1), (1, 3)]
    return AtomAdjacencyGraph(atoms, clusters, fg_mask, seeds,
                              out=get_output(None).derive(muted=True))


def test_adjacencies(adj):
    assert adj[1] == set()
    assert adj[2] == {3, 4}
    assert adj[3] == {2, 4}
    assert adj[4] == {2, 3}


def test_atom_labels(adj):
    assert adj.atom_labels == frozenset({1, 2, 3, 4})


def test_cluster_labels(adj):
    assert adj.cluster_labels == frozenset({1, 2})


def test_degrees(adj):
    assert adj.get_atom_degree(1) == 0
    assert adj.get_atom_degree(2) == 2
    assert adj.get_atom_degree(3) == 2
    assert adj.get_atom_degree(4) == 2
    assert adj.max_degree == 2


def test_atoms_in_cluster(adj):
    assert adj.get_atoms_in_cluster(1) == {1}
    assert adj.get_atoms_in_cluster(2) == {2, 3, 4}


def test_cluster_label(adj):
    assert adj.get_cluster_label(1) == 1
    assert adj.get_cluster_label(2) == 2
    assert adj.get_cluster_label(3) == 2
    assert adj.get_cluster_label(4) == 2


def test_seeds(adj):
    assert adj.get_seed(1) == (0, 0)
    assert adj.get_seed(2) == (0, 2)
    assert adj.get_seed(3) == (2, 1)
    assert adj.get_seed(4) == (1, 3)


def test_edge_lines(adj):
    assert sorted(adj.get_edge_lines()) == sorted(
        [((0, 2), (2, 1)), ((0, 2), (1, 3)), ((2, 1), (1, 3))])
    assert adj.get_edge_lines(lambda i: i != 4) == [((0, 2), (2, 1))]
    assert sorted(adj.get_edge_lines(lambda i: i != 4, reduce=False)) == sorted(
        [((0, 2), (2, 1)), ((2, 1), (0, 2))])
