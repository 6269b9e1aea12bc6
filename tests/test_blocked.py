"""Tests for the cluster-packed block-diagonal SpMM layout (graphs/blocked.py).

Oracle pattern per SURVEY.md §4: compute through the framework, recompute
with scipy dense-sparse arithmetic, compare elementwise.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy import sparse as sp

from gnn_tpu import graphs, native
from gnn_tpu.graphs.blocked import cluster_pack_order
from gnn_tpu.graphs.generate import stochastic_block_model
from gnn_tpu.ops import spmm


def _clustered_graph(N=600, k=12, seed=0, self_loops=True):
    data = stochastic_block_model(
        num_nodes=N, num_classes=k, seed=seed, p_in=0.12, p_out=0.004
    )
    ei = np.asarray(data.edge_index)
    ei, w = graphs.gcn_norm(ei, num_nodes=N, self_loops=self_loops)
    return ei, np.asarray(w, np.float32)


def _csr(ei, w, N):
    return sp.coo_matrix(
        (w, (np.asarray(ei[1]), np.asarray(ei[0]))), shape=(N, N)
    ).tocsr()


def test_cluster_pack_order_is_permutation_and_groups_labels():
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 37, 500)
    perm = cluster_pack_order(labels, rows=64)
    assert sorted(perm.tolist()) == list(range(500))
    # every label's nodes appear in at most ceil(size/64)+1 contiguous runs
    lab_new = labels[perm]
    for l in np.unique(labels):
        pos = np.nonzero(lab_new == l)[0]
        runs = 1 + int(np.sum(np.diff(pos) > 1))
        size = len(pos)
        assert runs <= -(-size // 64) + 1, (l, runs, size)


def test_cluster_order_pack_rows_boundary_invariant():
    """cluster_order(pack_rows=R): every R-aligned boundary — and hence
    every partition boundary, since partition_graph rounds n_max to a
    multiple of R under local_blocked — splits at most one community."""
    ei, _ = _clustered_graph(N=600, k=12, seed=3)
    R = 32
    # The label-level invariant holds for the PACKING stage; the boundary
    # refinement afterwards (refine_sweeps, default on) deliberately trades
    # it for strictly more intra-window EDGES (the actual capture
    # objective), so it is asserted with refinement off.
    perm = graphs.cluster_order(ei, 600, pack_rows=R, refine_sweeps=0)
    assert sorted(perm.tolist()) == list(range(600))
    # recover the communities the order was built from (same seeded LP)
    order0, rp0 = native.sort_edges_csr(ei[0], ei[1], 600)
    labels, _ = native.label_propagation(
        rp0, ei[0].astype(np.int64)[order0], max_size=R, n_iters=10, seed=0
    )
    lab_new = labels[perm]
    for b in range(0, 600 - R, R):
        # communities straddling the boundary at b+R
        left, right = lab_new[b : b + R], lab_new[b + R :]
        straddle = set(np.unique(left)) & set(np.unique(right))
        assert len(straddle) <= 1, (b, straddle)

    def capture(p):
        old2new = np.empty(600, np.int64)
        old2new[p] = np.arange(600)
        s, d = old2new[ei[0]] // R, old2new[ei[1]] // R
        return float((s == d).mean())

    refined = graphs.cluster_order(ei, 600, pack_rows=R)
    assert sorted(refined.tolist()) == list(range(600))
    assert capture(refined) >= capture(perm)


def test_label_propagation_recovers_sbm_blocks():
    N, k = 400, 4
    data = stochastic_block_model(num_nodes=N, num_classes=k, seed=3)
    ei = np.asarray(data.edge_index)
    order, rp = native.sort_edges_csr(ei[0], ei[1], N)
    labels, nk = native.label_propagation(rp, ei[0][order], n_iters=10, seed=1)
    # purity vs the generator's ground-truth block of each node
    truth = np.asarray(data.y)
    pur = 0
    for c in range(k):
        vals, counts = np.unique(labels[truth == c], return_counts=True)
        pur += int(counts.max())
    assert pur / N > 0.9


@pytest.mark.parametrize("block_rows", [32, 64])
def test_blocked_spmm_matches_dense_oracle(block_rows):
    N = 600
    ei, w = _clustered_graph(N=N, seed=1)
    adj = graphs.build_adjacency(
        ei, jnp.asarray(w), num_nodes=N, reorder="cluster",
        block_rows=block_rows,
    )
    assert adj.blocked is not None and adj.perm is not None
    assert adj.blocked.num_dense_edges > 0
    perm = np.asarray(adj.perm)
    A = _csr(ei, w, N)[perm][:, perm]
    x = np.random.default_rng(2).normal(size=(N, 24)).astype(np.float32)
    out = np.asarray(spmm(adj, jnp.asarray(x)))
    np.testing.assert_allclose(out, A @ x, rtol=2e-4, atol=2e-5)


def test_blocked_captures_most_sbm_edges():
    N = 600
    ei, w = _clustered_graph(N=N, k=12, seed=4)
    adj = graphs.build_adjacency(
        ei, jnp.asarray(w), num_nodes=N, reorder="cluster", block_rows=64
    )
    lay = adj.blocked
    frac = lay.num_dense_edges / (lay.num_dense_edges + lay.num_rem_edges)
    # 12 communities of ~50 nodes pack into 64-row windows; the intra
    # fraction of this SBM is ~0.75+, and packing must capture most of it
    assert frac > 0.6, frac


def test_blocked_grad_matches_segment_backend():
    N = 320
    ei, w = _clustered_graph(N=N, k=8, seed=5)
    adj = graphs.build_adjacency(
        ei, jnp.asarray(w), num_nodes=N, reorder="cluster", block_rows=32
    )
    perm = np.asarray(adj.perm)
    # segment-backend oracle on the SAME permuted graph
    old2new = np.empty(N, np.int64)
    old2new[perm] = np.arange(N)
    ei_p = old2new[np.asarray(ei)]
    adj_seg = graphs.build_adjacency(ei_p, jnp.asarray(w), num_nodes=N)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(N, 16)).astype(np.float32))
    ct = jnp.asarray(np.random.default_rng(4).normal(size=(N, 16)).astype(np.float32))

    g_blocked = jax.grad(lambda x: jnp.sum(spmm(adj, x) ** 2 * ct))(x)
    g_seg = jax.grad(
        lambda x: jnp.sum(spmm(adj_seg, x, backend="segment") ** 2 * ct)
    )(x)
    np.testing.assert_allclose(
        np.asarray(g_blocked), np.asarray(g_seg), rtol=2e-4, atol=2e-5
    )


def test_blocked_transpose_and_weight_swap():
    N = 320
    ei, w = _clustered_graph(N=N, k=8, seed=6)
    adj = graphs.build_adjacency(
        ei, jnp.asarray(w), num_nodes=N, reorder="cluster", block_rows=32
    )
    perm = np.asarray(adj.perm)
    A = _csr(ei, w, N)[perm][:, perm]
    x = np.random.default_rng(5).normal(size=(N, 8)).astype(np.float32)
    # transpose
    adj_t = adj.transpose()
    out_t = np.asarray(spmm(adj_t, jnp.asarray(x)))
    np.testing.assert_allclose(out_t, A.T @ x, rtol=2e-4, atol=2e-5)
    # weight swap AFTER transpose exercises the remapped edge-id tables
    adj_t2 = adj_t.with_weight(adj_t.weight * 3.0)
    np.testing.assert_allclose(
        np.asarray(spmm(adj_t2, jnp.asarray(x))), 3.0 * (A.T @ x),
        rtol=2e-4, atol=5e-5,
    )
    # weight swap: doubled weights double the output (swap is in the
    # adjacency's canonical dst-sorted edge order)
    w2 = np.asarray(adj.weight) * 2.0
    adj2 = adj.with_weight(jnp.asarray(w2))
    out2 = np.asarray(spmm(adj2, jnp.asarray(x)))
    np.testing.assert_allclose(
        out2, 2.0 * np.asarray(spmm(adj, jnp.asarray(x))), rtol=1e-5
    )


def test_blocked_gcn_model_trains():
    from gnn_tpu import nn, optim
    from gnn_tpu.models import GCN

    data = stochastic_block_model(num_nodes=256, num_classes=4, seed=9)
    adj = data.to_adjacency(norm="sym", reorder="cluster", block_rows=32)
    data_p = data.permute_nodes(np.asarray(adj.perm))
    model = GCN(data.num_features, 32, 4, key=jax.random.PRNGKey(0), dropout=0.0)
    params, static = nn.partition(model)
    opt = optim.adam(1e-2)
    ost = opt.init(params)

    @jax.jit
    def step(p, o):
        def lf(p):
            logits = nn.combine(p, static)(data_p.x, adj)
            return nn.cross_entropy(logits, data_p.y, data_p.train_mask)

        l, g = jax.value_and_grad(lf)(p)
        u, o = opt.update(g, o, p)
        return optim.apply_updates(p, u), o, l

    losses = []
    for _ in range(40):
        params, ost, loss = step(params, ost)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[:3] + losses[-3:]
    logits = nn.inference_mode(nn.combine(params, static))(data_p.x, adj)
    acc = float(nn.accuracy(logits, data_p.y, data_p.test_mask))
    assert acc > 0.8, acc


def test_cluster_order_shrinks_partition_halo():
    """Community-contiguous relabeling must cut the total all_to_all halo
    of the node-range partition toward the inter-community edge fraction
    (docs/SCALING.md second table). The max per-PAIR halo (h_max) is less
    sensitive — partition boundaries still cut single communities — so the
    assertion is on total unique remote rows, the wire volume that actually
    scales with P."""
    from benchmarks.scaling import partition_comm

    N, P = 512, 8
    data = stochastic_block_model(
        num_nodes=N, num_classes=16, seed=7, p_in=0.2, p_out=0.002
    )
    ei = np.asarray(data.edge_index)
    ei, w = graphs.gcn_norm(ei, num_nodes=N)
    src, dst = np.asarray(ei[0], np.int64), np.asarray(ei[1], np.int64)

    plain = partition_comm(src, dst, N, P)["rows_raw"].sum()
    # cap communities at the part size so none is forced to straddle
    perm = graphs.cluster_order(ei, N, seed=1, max_size=N // P)
    old2new = np.empty(N, np.int64)
    old2new[perm] = np.arange(N)
    clust = partition_comm(old2new[src], old2new[dst], N, P)["rows_raw"].sum()
    assert clust < plain / 2, (clust, plain)


@pytest.mark.slow
def test_distributed_fit_with_cluster_order():
    from gnn_tpu.train import Config, fit

    data = stochastic_block_model(num_nodes=128, num_classes=4, seed=11)
    cfg = Config()
    cfg.model.name = "gcn"
    cfg.model.hidden = 16
    cfg.model.dropout = 0.0
    cfg.train.epochs = 3
    cfg.train.eval_every = 1
    cfg.dist.num_parts = 8
    cfg.dist.cluster_order = True
    _, _, history = fit(cfg, data, verbose=False)
    assert history and np.isfinite(history[-1]["loss"])


def test_clustered_power_law_generator():
    from gnn_tpu.graphs.generate import clustered_power_law

    N, E = 5000, 30000
    ei = clustered_power_law(N, E, avg_community=100, intra_frac=0.9, seed=0)
    assert ei.shape[0] == 2 and ei.min() >= 0 and ei.max() < N
    # no self loops, coalesced
    assert (ei[0] != ei[1]).all()
    assert len(np.unique(ei[0] * N + ei[1])) == ei.shape[1]
    # shuffled ids: community structure must NOT be visible in id order
    # (adjacent-id edge fraction stays tiny), yet clustering must find it
    near = np.mean(np.abs(ei[0] - ei[1]) < 100)
    assert near < 0.2, near
    perm = graphs.cluster_order(ei, N, max_size=256, seed=1)
    old2new = np.empty(N, np.int64)
    old2new[perm] = np.arange(N)
    ei_c = old2new[np.asarray(ei)]
    near_c = np.mean(np.abs(ei_c[0] - ei_c[1]) < 256)
    assert near_c > 0.5, near_c


def test_blocked_leveled_remainder_engaged_and_exact():
    """The undirected cluster adjacency must use the leveled-ELL remainder
    (no scatter path), cover every remainder edge across levels + tail, and
    stay exact vs the dense oracle."""
    N = 600
    ei, w = _clustered_graph(N=N, k=12, seed=13)
    adj = graphs.build_adjacency(
        ei, jnp.asarray(w), num_nodes=N, reorder="cluster", block_rows=64,
        rem_backend="levels",
    )
    lay = adj.blocked
    assert lay.use_levels and adj.t_blocked.use_levels
    covered = sum(
        int((np.asarray(l.eid) != adj.num_edges).sum()) for l in lay.levels
    )
    if lay.tail_eid is not None:
        covered += int((np.asarray(lay.tail_eid) != adj.num_edges).sum())
    assert covered == lay.num_rem_edges
    perm = np.asarray(adj.perm)
    A = _csr(ei, w, N)[perm][:, perm]
    x = np.random.default_rng(7).normal(size=(N, 8)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(spmm(adj, jnp.asarray(x))), A @ x, rtol=2e-4, atol=2e-5
    )


def test_blocked_directed_falls_back_to_kernel_path():
    """A directed (degree-asymmetric) remainder cannot share the leveled
    prefix across fwd and transpose — the builder must fall back to the
    chunk-plan path and stay exact."""
    rng = np.random.default_rng(21)
    N = 300
    ei = np.stack([rng.integers(0, N, 2500), rng.integers(0, N, 2500)])
    ei, _ = graphs.coalesce(ei, num_nodes=N)
    w = rng.random(ei.shape[1]).astype(np.float32)
    adj = graphs.build_adjacency(
        ei, jnp.asarray(w), num_nodes=N, reorder="cluster", block_rows=32
    )
    assert not (adj.blocked.use_levels and adj.t_blocked.use_levels)
    perm = np.asarray(adj.perm)
    A = _csr(ei, w, N)[perm][:, perm]
    x = rng.normal(size=(N, 8)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(spmm(adj, jnp.asarray(x))), A @ x, rtol=2e-4, atol=2e-5
    )
    g = jax.grad(lambda x: jnp.sum(spmm(adj, x) ** 2))(jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(g), 2 * A.T @ (A @ x), rtol=2e-4, atol=2e-5
    )


def test_blocked_bucket_remainder_matches_dense_and_grads():
    """rem_backend='bucket' (round 5: degree-bucketed direct slot tables,
    ops/edge_agg.py) — dense-oracle parity, grads, transpose, weight swap."""
    rng = np.random.default_rng(11)
    n, e = 900, 9000
    ei, _ = _clustered_graph(N=n, k=18, seed=4)
    ei, w = graphs.gcn_norm(ei, num_nodes=n, self_loops=True)
    adj = graphs.build_adjacency(
        ei, jnp.asarray(w), num_nodes=n,
        reorder="cluster", block_rows=64, rem_backend="bucket",
    )
    assert adj.blocked.rem_bucket is not None
    assert not adj.blocked.use_levels and adj.blocked.rem_plan is None
    E = ei.shape[1]
    x = jnp.asarray(rng.normal(size=(n, 12)).astype(np.float32))
    perm = np.asarray(adj.perm)
    dense = np.zeros((n, n), np.float32)
    old2new = np.empty(n, np.int64)
    old2new[perm] = np.arange(n)
    np.add.at(
        dense, (old2new[np.asarray(ei[1])], old2new[np.asarray(ei[0])]), w
    )
    out = np.asarray(spmm(adj, x))
    np.testing.assert_allclose(out, dense @ np.asarray(x), atol=2e-4)
    # backward dx through the transpose layout
    g = jax.grad(lambda x: 0.5 * jnp.sum(spmm(adj, x) ** 2))(x)
    want = dense.T @ (dense @ np.asarray(x))
    np.testing.assert_allclose(np.asarray(g), want, rtol=2e-3, atol=2e-3)
    # weight swap re-bakes bucket slot weights (canonical edge order)
    adj2 = adj.with_weight(adj.weight * 2.0)
    out2 = np.asarray(spmm(adj2, x))
    np.testing.assert_allclose(out2, 2.0 * out, rtol=1e-5, atol=1e-5)
