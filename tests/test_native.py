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


def test_refine_windows_native_matches_python(rng, monkeypatch):
    """The native KL-style swap sweep produces EXACTLY the Python
    fallback's assignment (same visit order, FIFO pairing, tie-breaks)."""
    from gnn_tpu import native
    from gnn_tpu.graphs.generate import clustered_power_law
    from gnn_tpu.graphs import to_undirected

    if not native.available():
        pytest.skip("no native toolchain")
    for seed in range(3):
        n = 400
        ei = clustered_power_law(
            n, 1600, avg_community=40, intra_frac=0.8, seed=seed
        )
        ei, _ = to_undirected(ei, num_nodes=n)
        order, rp = native.sort_edges_csr(ei[0], ei[1], n)
        col = np.asarray(ei[0], np.int64)[order]
        # a deliberately bad assignment: round-robin scatters communities
        win0 = (np.arange(n) % 5).astype(np.int64)
        nat, s_nat = native.refine_windows(rp, col, win0, 5, n_sweeps=3)
        with monkeypatch.context() as m:
            m.setattr(native, "_load", lambda: None)
            py, s_py = native.refine_windows(rp, col, win0, 5, n_sweeps=3)
        np.testing.assert_array_equal(nat, py)
        assert s_nat == s_py > 0
        # swaps preserve window sizes exactly
        np.testing.assert_array_equal(
            np.bincount(nat, minlength=5), np.bincount(win0, minlength=5)
        )


def test_refine_windows_improves_capture(rng):
    """Every accepted swap raises the intra-window edge fraction on a
    symmetric graph — and on a community graph with a shuffled packing the
    gain is material."""
    from gnn_tpu import native
    from gnn_tpu.graphs.generate import clustered_power_law
    from gnn_tpu.graphs import to_undirected

    n, R = 1024, 64
    ei = clustered_power_law(
        n, 6000, avg_community=48, intra_frac=0.85, seed=3
    )
    ei, _ = to_undirected(ei, num_nodes=n)
    order, rp = native.sort_edges_csr(ei[0], ei[1], n)
    col = np.asarray(ei[0], np.int64)[order]
    src, dst = np.asarray(ei[0], np.int64), np.asarray(ei[1], np.int64)

    def capture(win):
        return float((win[src] == win[dst]).mean())

    win0 = rng.permutation(n) // R  # shuffled: near-random capture
    win1, swaps = native.refine_windows(rp, col, win0, n // R, n_sweeps=8)
    assert swaps > 0
    assert capture(win1) > capture(win0) + 0.1


def test_louvain_cluster_respects_cap_and_recovers_structure(rng):
    """Size-capped Louvain: communities never exceed the cap and recover a
    planted partition at least as well as plurality LP on label capture."""
    from gnn_tpu import native
    from gnn_tpu.graphs.generate import clustered_power_law
    from gnn_tpu.graphs import to_undirected

    if not native.available():
        pytest.skip("no native toolchain")
    n = 2000
    ei = clustered_power_law(
        n, 12_000, avg_community=60, intra_frac=0.85, seed=1
    )
    ei, _ = to_undirected(ei, num_nodes=n)
    order, rp = native.sort_edges_csr(ei[0], ei[1], n)
    col = np.asarray(ei[0], np.int64)[order]
    src, dst = np.asarray(ei[0], np.int64), np.asarray(ei[1], np.int64)
    cap = 128
    lab, k = native.louvain_cluster(rp, col, max_size=cap, seed=0)
    assert lab.shape == (n,) and lab.min() == 0 and lab.max() == k - 1
    assert np.bincount(lab).max() <= cap
    lp, _ = native.label_propagation(rp, col, max_size=cap, seed=0)
    cap_louvain = float((lab[src] == lab[dst]).mean())
    cap_lp = float((lp[src] == lp[dst]).mean())
    assert cap_louvain >= cap_lp - 0.01  # ties LP at worst
    assert cap_louvain > 0.5  # recovers most of the planted structure
