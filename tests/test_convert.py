"""Graph converter tests.

Mirrors the reference's round-trip tests (tests/graph.test.cpp:19-29) and
adds the property tests the reference lacks (SURVEY.md §4).
"""

import numpy as np
import pytest

from gnn_tpu import graphs


def random_graph(rng, n=20, e=60):
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    ei, _ = graphs.coalesce(np.stack([src, dst]), num_nodes=n)
    return ei, n


def test_edge_list_builder():
    ei = graphs.edge_list([0, 1, 2], [1, 2, 0])
    assert ei.shape == (2, 3)
    assert ei.dtype.name == "int32"
    with pytest.raises(ValueError):
        graphs.edge_list([0, 1], [1])


def test_dense_round_trip(rng):
    # edge_list -> adj -> edge_list round trip (reference graph.test.cpp:19-29)
    ei, n = random_graph(rng)
    adj = graphs.to_dense_adj(ei, num_nodes=n)
    ei2, w2 = graphs.dense_to_edge_list(adj)
    adj2 = graphs.to_dense_adj(ei2, w2, num_nodes=n)
    np.testing.assert_array_equal(np.asarray(adj), np.asarray(adj2))


def test_dense_adj_orientation():
    # A[dst, src] so A @ X aggregates into destinations.
    ei = graphs.edge_list([0], [1])  # edge 0 -> 1
    adj = np.asarray(graphs.to_dense_adj(ei, num_nodes=2))
    assert adj[1, 0] == 1.0 and adj[0, 1] == 0.0


def test_csr_round_trip(rng):
    ei, n = random_graph(rng)
    row_ptr, col, perm = graphs.edge_list_to_csr(ei, n)
    ei2 = graphs.csr_to_edge_list(row_ptr, col)
    # round trip preserves the (sorted) edge set
    a = set(map(tuple, np.asarray(ei).T.tolist()))
    b = set(map(tuple, np.asarray(ei2).T.tolist()))
    assert a == b


def test_add_self_loops():
    ei = np.array([[0, 1], [1, 2]])
    out, w = graphs.add_self_loops(ei, np.array([0.5, 0.5]), fill_value=2.0, num_nodes=3)
    assert out.shape == (2, 5)
    # appended loops (i, i) for all 3 nodes with fill weight
    assert np.all(out[:, 2:] == np.arange(3))
    np.testing.assert_allclose(w[2:], 2.0)


def test_remove_self_loops():
    ei = np.array([[0, 1, 2], [0, 2, 2]])
    out, _ = graphs.remove_self_loops(ei)
    assert out.shape == (2, 1)
    assert out[0, 0] == 1 and out[1, 0] == 2


def test_coalesce_merges_duplicates():
    ei = np.array([[0, 0, 1], [1, 1, 2]])
    w = np.array([1.0, 2.0, 3.0])
    out, ow = graphs.coalesce(ei, w)
    assert out.shape == (2, 2)
    np.testing.assert_allclose(sorted(ow.tolist()), [3.0, 3.0])


def test_to_undirected():
    ei = np.array([[0], [1]])
    out, _ = graphs.to_undirected(ei, num_nodes=2)
    pairs = set(map(tuple, out.T.tolist()))
    assert pairs == {(0, 1), (1, 0)}


def test_gcn_norm_exact_vs_dense(rng):
    """gcn_norm per-edge weights must equal dense D^-1/2 (A+I) D^-1/2."""
    ei, n = random_graph(rng, n=12, e=30)
    ei2, w = graphs.gcn_norm(ei, num_nodes=n, self_loops=True)
    got = np.asarray(graphs.to_dense_adj(ei2, w, num_nodes=n))

    A = np.array(graphs.to_dense_adj(ei, num_nodes=n))
    np.fill_diagonal(A, 1.0)  # add_remaining_self_loops semantics
    d = A.sum(axis=1)
    dinv = np.where(d > 0, d**-0.5, 0)
    want = np.diag(dinv) @ A @ np.diag(dinv)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_gcn_norm_row(rng):
    ei, n = random_graph(rng, n=10, e=25)
    ei2, w = graphs.gcn_norm(ei, num_nodes=n, norm="row")
    got = np.asarray(graphs.to_dense_adj(ei2, w, num_nodes=n))
    rowsum = got.sum(axis=1)
    np.testing.assert_allclose(rowsum[rowsum > 0], 1.0, atol=1e-6)


def test_degree():
    ei = np.array([[0, 0, 1], [1, 2, 2]])
    np.testing.assert_allclose(graphs.degree(ei, 3, kind="in"), [0, 1, 2])
    np.testing.assert_allclose(graphs.degree(ei, 3, kind="out"), [2, 1, 0])
