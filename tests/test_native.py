"""C++ graph-core tests: native results must match the numpy fallbacks."""

import numpy as np
import pytest

from gnn_tpu import native


def test_native_compiles():
    assert native.available(), "native graph-core failed to compile/load"


def test_sort_edges_matches_lexsort(rng):
    n, e = 50, 300
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    perm, row_ptr = native.sort_edges_csr(src, dst, n)
    # sorted by (dst, src)
    s, d = src[perm], dst[perm]
    assert np.all(np.diff(d) >= 0)
    same = np.diff(d) == 0
    assert np.all(np.diff(s)[same] >= 0)
    # row_ptr consistent
    counts = np.bincount(dst, minlength=n)
    np.testing.assert_array_equal(np.diff(row_ptr), counts)
    # permutation is a bijection
    assert len(np.unique(perm)) == e


def test_sort_edges_rejects_bad_ids():
    with pytest.raises(ValueError):
        native.sort_edges_csr(np.array([0, 99]), np.array([0, 1]), 5)


def test_degrees_weighted(rng):
    nodes = rng.integers(0, 10, 100)
    w = rng.normal(size=100).astype(np.float32)
    got = native.degrees(nodes, 10, w)
    want = np.zeros(10)
    np.add.at(want, nodes, w.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_sample_neighbors_host(rng):
    # CSR: node 0 <- {1,2,3}, node 1 <- {4}, node 2 <- {}
    row_ptr = np.array([0, 3, 4, 4])
    col = np.array([1, 2, 3, 4])
    out = native.sample_neighbors_host(
        row_ptr, col, np.array([0, 1, 2]), 5, seed=1, replace=True
    )
    assert set(out[0]) <= {1, 2, 3}
    assert np.all(out[1] == 4)
    assert out[2, 0] == 2 and np.all(out[2, 1:] == -1)  # zero-degree

    # without replacement: no duplicates, -1 padding
    out = native.sample_neighbors_host(
        row_ptr, col, np.array([0, 1]), 5, seed=2, replace=False
    )
    row0 = out[0][out[0] >= 0]
    assert len(set(row0)) == len(row0) == 3
    assert np.all(out[1][1:] == -1)

    # without replacement, deg > fanout: exactly fanout unique draws
    row_ptr2 = np.array([0, 10])
    col2 = np.arange(10)
    out = native.sample_neighbors_host(
        row_ptr2, col2, np.array([0]), 4, seed=3, replace=False
    )
    assert len(set(out[0])) == 4
    assert np.all(out[0] >= 0)


def test_partition_by_edges():
    # degrees: [10, 1, 1, 10, 1, 1] -> balanced parts should split hubs
    row_ptr = np.cumsum([0, 10, 1, 1, 10, 1, 1])
    bounds = native.partition_by_edges(row_ptr, 2)
    assert bounds[0] == 0 and bounds[-1] == 6
    left = row_ptr[bounds[1]] - row_ptr[bounds[0]]
    right = row_ptr[bounds[2]] - row_ptr[bounds[1]]
    assert abs(int(left) - int(right)) <= 10  # within one hub


def test_build_adjacency_uses_native_path(rng):
    """build_adjacency results identical whether sorted natively or not."""
    from gnn_tpu import graphs

    n, e = 40, 200
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    ei = np.stack([src, dst])
    w = rng.normal(size=e).astype(np.float32)
    adj = graphs.build_adjacency(ei, w, num_nodes=n, layout="csr")
    # oracle ordering via numpy
    order = np.lexsort((src, dst))
    np.testing.assert_array_equal(np.asarray(adj.src), src[order])
    np.testing.assert_array_equal(np.asarray(adj.dst), dst[order])
    np.testing.assert_allclose(np.asarray(adj.weight), w[order], rtol=1e-6)


def test_coalesce_uses_native_and_matches(rng):
    from gnn_tpu import graphs

    n, e = 100, 1000
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    w = rng.normal(size=e).astype(np.float32)
    out_n, w_n = graphs.coalesce(np.stack([src, dst]), w, num_nodes=n)
    out_p, w_p = graphs.coalesce(np.stack([src, dst]), w)  # lexsort path
    np.testing.assert_array_equal(out_n, out_p)
    np.testing.assert_allclose(w_n, w_p, rtol=1e-6)


def test_cluster_pack_native_matches_python(rng, monkeypatch):
    """The native segment-tree first-fit produces EXACTLY the Python
    packer's permutation (same FFD order, same bin emission)."""
    from gnn_tpu import native
    from gnn_tpu.graphs import blocked

    if not native.available():
        pytest.skip("no native toolchain")
    for _ in range(5):
        n = int(rng.integers(50, 2000))
        k = int(rng.integers(2, 50))
        labels = rng.integers(0, k, n).astype(np.int64)
        rows = int(rng.choice([8, 16, 64, 512]))
        nat = blocked.cluster_pack_order(labels, rows)
        with monkeypatch.context() as m:
            m.setattr(native, "cluster_pack", lambda *a: None)
            py = blocked.cluster_pack_order(labels, rows)
        np.testing.assert_array_equal(nat, py)
        # valid permutation
        assert np.array_equal(np.sort(nat), np.arange(n))
