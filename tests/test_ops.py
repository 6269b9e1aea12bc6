"""Segment / SpMM / SDDMM op tests — sparse results and gradients must match
their dense-matrix counterparts (the reference computes everything densely,
src/graph.cpp:204-212, so dense is the parity oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_tpu import graphs, ops


def make_adj(rng, n=15, e=50, weighted=True):
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    ei, _ = graphs.coalesce(np.stack([src, dst]), num_nodes=n)
    w = (
        jnp.asarray(rng.normal(size=ei.shape[1]).astype(np.float32))
        if weighted
        else None
    )
    adj = graphs.build_adjacency(ei, w, num_nodes=n)
    dense = np.asarray(graphs.to_dense_adj(ei, w, num_nodes=n))
    return adj, dense


def test_segment_ops_vs_numpy(rng):
    data = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
    seg = jnp.asarray(np.sort(rng.integers(0, 4, 10)))
    d, s = np.asarray(data), np.asarray(seg)
    want_sum = np.zeros((5, 3), np.float32)
    np.add.at(want_sum, s, d)
    np.testing.assert_allclose(
        ops.segment_sum(data, seg, 5, indices_are_sorted=True), want_sum, rtol=1e-5
    )
    counts = np.maximum(np.bincount(s, minlength=5), 1)[:, None]
    np.testing.assert_allclose(
        ops.segment_mean(data, seg, 5), want_sum / counts, rtol=1e-5
    )
    want_max = np.full((5, 3), -np.inf, np.float32)
    np.maximum.at(want_max, s, d)
    got_max = np.asarray(ops.segment_max(data, seg, 5))
    np.testing.assert_allclose(got_max[np.isfinite(want_max)][...], want_max[np.isfinite(want_max)], rtol=1e-5)


def test_segment_softmax_sums_to_one(rng):
    logits = jnp.asarray(rng.normal(size=20).astype(np.float32))
    seg = jnp.asarray(np.sort(rng.integers(0, 5, 20)))
    sm = ops.segment_softmax(logits, seg, 5, indices_are_sorted=True)
    sums = np.zeros(5)
    np.add.at(sums, np.asarray(seg), np.asarray(sm))
    present = np.bincount(np.asarray(seg), minlength=5) > 0
    np.testing.assert_allclose(sums[present], 1.0, rtol=1e-5)


def test_segment_softmax_stability():
    logits = jnp.array([1000.0, 1000.0, -1000.0])
    seg = jnp.array([0, 0, 1])
    sm = np.asarray(ops.segment_softmax(logits, seg, 2))
    assert np.isfinite(sm).all()
    np.testing.assert_allclose(sm[:2], 0.5, rtol=1e-5)


def test_segment_softmax_grad_matches_dense(rng):
    logits = jnp.asarray(rng.normal(size=6).astype(np.float32))
    seg = jnp.array([0, 0, 0, 1, 1, 1])

    def f_seg(l):
        return jnp.sum(ops.segment_softmax(l, seg, 2) * jnp.arange(6.0))

    def f_dense(l):
        a = jax.nn.softmax(l[:3])
        b = jax.nn.softmax(l[3:])
        return jnp.sum(a * jnp.arange(3.0)) + jnp.sum(b * jnp.arange(3.0, 6.0))

    np.testing.assert_allclose(
        jax.grad(f_seg)(logits), jax.grad(f_dense)(logits), rtol=1e-4, atol=1e-6
    )


def test_spmm_matches_dense(rng):
    adj, dense = make_adj(rng)
    x = jnp.asarray(rng.normal(size=(15, 4)).astype(np.float32))
    np.testing.assert_allclose(ops.spmm(adj, x), dense @ np.asarray(x), rtol=1e-4, atol=1e-5)


def test_spmm_unweighted(rng):
    adj, dense = make_adj(rng, weighted=False)
    x = jnp.asarray(rng.normal(size=(15, 4)).astype(np.float32))
    np.testing.assert_allclose(ops.spmm(adj, x), dense @ np.asarray(x), rtol=1e-4, atol=1e-5)


def test_spmm_x_grad_matches_dense(rng):
    adj, dense = make_adj(rng)
    x = jnp.asarray(rng.normal(size=(15, 4)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(15, 4)).astype(np.float32))
    g_sparse = jax.grad(lambda x: jnp.sum((ops.spmm(adj, x) - tgt) ** 2))(x)
    g_dense = jax.grad(lambda x: jnp.sum((jnp.asarray(dense) @ x - tgt) ** 2))(x)
    np.testing.assert_allclose(g_sparse, g_dense, rtol=1e-4, atol=1e-4)


def test_spmm_weight_grad_matches_dense(rng):
    adj, dense = make_adj(rng)
    x = jnp.asarray(rng.normal(size=(15, 4)).astype(np.float32))

    def f_sparse(w):
        return jnp.sum(jnp.sin(ops.spmm(adj.with_weight(w), x)))

    g_w = jax.grad(f_sparse)(adj.weight)

    # dense oracle: dL/dA then pick entries
    def f_dense(A):
        return jnp.sum(jnp.sin(A @ x))

    gA = np.asarray(jax.grad(f_dense)(jnp.asarray(dense)))
    expected = gA[np.asarray(adj.dst), np.asarray(adj.src)]
    np.testing.assert_allclose(g_w, expected, rtol=1e-4, atol=1e-5)


def test_spmm_transpose(rng):
    adj, dense = make_adj(rng)
    x = jnp.asarray(rng.normal(size=(15, 4)).astype(np.float32))
    np.testing.assert_allclose(
        ops.spmm(adj.transpose(), x), dense.T @ np.asarray(x), rtol=1e-4, atol=1e-5
    )


def test_spmm_rejects_bad_rank(rng):
    adj, _ = make_adj(rng)
    with pytest.raises(ValueError):
        ops.spmm(adj, jnp.ones((15,)))


def test_spmm_coo(rng):
    adj, dense = make_adj(rng)
    x = jnp.asarray(rng.normal(size=(15, 4)).astype(np.float32))
    out = ops.spmm_coo(adj.src, adj.dst, x, 15, adj.weight, indices_are_sorted=True)
    np.testing.assert_allclose(out, dense @ np.asarray(x), rtol=1e-4, atol=1e-5)


def test_sddmm_matches_dense(rng):
    adj, dense = make_adj(rng)
    a = jnp.asarray(rng.normal(size=(15, 4)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(15, 4)).astype(np.float32))
    got = np.asarray(ops.sddmm(adj.src, adj.dst, a, b))
    full = np.asarray(a) @ np.asarray(b).T  # [dst, src]
    expected = full[np.asarray(adj.dst), np.asarray(adj.src)]
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_spmm_under_jit(rng):
    adj, dense = make_adj(rng)
    x = jnp.asarray(rng.normal(size=(15, 4)).astype(np.float32))
    f = jax.jit(lambda adj, x: ops.spmm(adj, x))
    np.testing.assert_allclose(f(adj, x), dense @ np.asarray(x), rtol=1e-4, atol=1e-5)


def test_empty_graph():
    adj = graphs.build_adjacency(np.zeros((2, 0), np.int32), num_nodes=3)
    out = ops.spmm(adj, jnp.ones((3, 2)))
    np.testing.assert_allclose(out, 0.0)


# -- ELL fast-path backend --------------------------------------------------


def make_ell_adj(rng, n=60, e=400):
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    ei, _ = graphs.coalesce(np.stack([src, dst]), num_nodes=n)
    w = jnp.asarray(rng.normal(size=ei.shape[1]).astype(np.float32))
    adj = graphs.build_adjacency(ei, w, num_nodes=n, layout="ell")
    dense = np.asarray(graphs.to_dense_adj(ei, w, num_nodes=n))
    return adj, dense


def test_ell_spmm_matches_dense(rng):
    adj, dense = make_ell_adj(rng)
    x = jnp.asarray(rng.normal(size=(60, 8)).astype(np.float32))
    np.testing.assert_allclose(
        ops.spmm(adj, x, backend="ell"), dense @ np.asarray(x), rtol=1e-4, atol=1e-4
    )


def test_ell_auto_backend_selected(rng):
    adj, dense = make_ell_adj(rng)
    assert adj.ell is not None
    x = jnp.asarray(rng.normal(size=(60, 8)).astype(np.float32))
    np.testing.assert_allclose(
        ops.spmm(adj, x), dense @ np.asarray(x), rtol=1e-4, atol=1e-4
    )


def test_ell_unweighted(rng):
    adj, _ = make_ell_adj(rng)
    adj = adj.with_weight(None)
    dense = (np.asarray(graphs.to_dense_adj(adj.edge_index, num_nodes=60)) > 0) * 1.0
    x = jnp.asarray(rng.normal(size=(60, 8)).astype(np.float32))
    np.testing.assert_allclose(
        ops.spmm(adj, x, backend="ell"), dense @ np.asarray(x), rtol=1e-4, atol=1e-4
    )


def test_ell_x_grad_matches_dense(rng):
    adj, dense = make_ell_adj(rng)
    x = jnp.asarray(rng.normal(size=(60, 8)).astype(np.float32))
    g_ell = jax.grad(lambda x: jnp.sum(jnp.sin(ops.spmm(adj, x, backend="ell"))))(x)
    g_dense = jax.grad(lambda x: jnp.sum(jnp.sin(jnp.asarray(dense) @ x)))(x)
    np.testing.assert_allclose(g_ell, g_dense, rtol=1e-4, atol=1e-4)


def test_ell_weight_grad_matches_dense(rng):
    """Differentiable per-edge weights go through spmm_edge_weighted."""
    adj, dense = make_ell_adj(rng)
    x = jnp.asarray(rng.normal(size=(60, 8)).astype(np.float32))

    g_w = jax.grad(
        lambda w: jnp.sum(jnp.sin(ops.spmm_edge_weighted(adj, w, x)))
    )(adj.weight)
    gA = np.asarray(
        jax.grad(lambda A: jnp.sum(jnp.sin(A @ x)))(jnp.asarray(dense))
    )
    expected = gA[np.asarray(adj.dst), np.asarray(adj.src)]
    np.testing.assert_allclose(g_w, expected, rtol=1e-4, atol=1e-4)


def test_ell_transpose(rng):
    adj, dense = make_ell_adj(rng)
    x = jnp.asarray(rng.normal(size=(60, 8)).astype(np.float32))
    adj_t = adj.transpose()
    np.testing.assert_allclose(
        ops.spmm(adj_t, x, backend="ell"), dense.T @ np.asarray(x), rtol=1e-4, atol=1e-4
    )


def test_ell_heavy_node_split(rng):
    """A hub with degree > 2*K_max=1024 must split across >2 rows and
    recombine through the heavy fix-up table (degree 512..~1024 hubs take
    the cheaper inv_light/inv_light2 two-gather combine instead)."""
    n = 1400
    hub_src = np.arange(1, 1250)
    src = np.concatenate([hub_src, rng.integers(0, n, 200)])
    dst = np.concatenate([np.zeros(len(hub_src), np.int64), rng.integers(1, n, 200)])
    ei, _ = graphs.coalesce(np.stack([src, dst]), num_nodes=n)
    w = jnp.asarray(rng.normal(size=ei.shape[1]).astype(np.float32))
    adj = graphs.build_adjacency(ei, w, num_nodes=n, layout="ell")
    assert int(adj.ell.heavy_ids.shape[0]) >= 1
    dense = np.asarray(graphs.to_dense_adj(ei, w, num_nodes=n))
    x = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    np.testing.assert_allclose(
        ops.spmm(adj, x, backend="ell"), dense @ np.asarray(x), rtol=1e-3, atol=1e-3
    )
    # gradient through the heavy path too
    g = jax.grad(lambda x: jnp.sum(ops.spmm(adj, x, backend="ell") ** 2))(x)
    gd = jax.grad(lambda x: jnp.sum((jnp.asarray(dense) @ x) ** 2))(x)
    np.testing.assert_allclose(g, gd, rtol=1e-3, atol=1e-3)


def test_ell_isolated_nodes(rng):
    """Nodes with zero in-degree must produce zero rows."""
    ei = np.array([[1, 2], [2, 1]])
    adj = graphs.build_adjacency(ei, num_nodes=5, layout="ell")
    x = jnp.asarray(rng.normal(size=(5, 4)).astype(np.float32))
    out = np.asarray(ops.spmm(adj, x, backend="ell"))
    np.testing.assert_allclose(out[0], 0.0)
    np.testing.assert_allclose(out[3], 0.0)
    np.testing.assert_allclose(out[4], 0.0)


def test_ell_matches_segment_backend(rng):
    adj, _ = make_ell_adj(rng)
    x = jnp.asarray(rng.normal(size=(60, 8)).astype(np.float32))
    np.testing.assert_allclose(
        ops.spmm(adj, x, backend="ell"),
        ops.spmm(adj, x, backend="segment"),
        rtol=1e-4,
        atol=1e-4,
    )


# -- robustness: extreme degree distributions -------------------------------


def test_ell_star_graph(rng):
    """Star: one node receives from everyone (deg N-1), others deg<=1."""
    n = 2000
    src = np.arange(1, n)
    dst = np.zeros(n - 1, np.int64)
    ei = np.stack([src, dst])
    adj = graphs.build_adjacency(ei, num_nodes=n, layout="ell")
    x = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    out = np.asarray(ops.spmm(adj, x))
    np.testing.assert_allclose(out[0], np.asarray(x)[1:].sum(0), rtol=1e-3)
    np.testing.assert_allclose(out[1:], 0.0, atol=1e-6)
    # backward through the heavy split path
    g = jax.grad(lambda x: jnp.sum(ops.spmm(adj, x)[0]))(x)
    np.testing.assert_allclose(np.asarray(g)[1:], 1.0, rtol=1e-4)


def test_ell_chain_graph(rng):
    """Path graph: every in-degree exactly 1 (all in the K=1 bucket)."""
    n = 4096
    ei = np.stack([np.arange(n - 1), np.arange(1, n)])
    adj = graphs.build_adjacency(ei, num_nodes=n, layout="ell")
    x = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    out = np.asarray(ops.spmm(adj, x))
    np.testing.assert_allclose(out[1:], np.asarray(x)[:-1], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out[0], 0.0)


def test_self_loop_only_graph(rng):
    n = 64
    ei = np.stack([np.arange(n), np.arange(n)])
    w = rng.normal(size=n).astype(np.float32)
    adj = graphs.build_adjacency(ei, w, num_nodes=n, layout="ell")
    x = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    np.testing.assert_allclose(
        ops.spmm(adj, x), w[:, None] * np.asarray(x), rtol=1e-4, atol=1e-5
    )


# -- global pooling (graph-level readout over Batch) --------------------------


def test_global_pools_match_numpy(rng):
    from gnn_tpu.ops import global_add_pool, global_mean_pool, global_max_pool

    sizes = [5, 1, 7, 3]
    gid = np.repeat(np.arange(len(sizes)), sizes).astype(np.int32)
    x = rng.normal(size=(gid.size, 6)).astype(np.float32)
    add = np.asarray(global_add_pool(jnp.asarray(x), jnp.asarray(gid), 4))
    mean = np.asarray(global_mean_pool(jnp.asarray(x), jnp.asarray(gid), 4))
    mx = np.asarray(global_max_pool(jnp.asarray(x), jnp.asarray(gid), 4))
    for g, s in enumerate(sizes):
        rows = x[gid == g]
        np.testing.assert_allclose(add[g], rows.sum(0), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(mean[g], rows.mean(0), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(mx[g], rows.max(0), rtol=1e-5, atol=1e-6)


def test_global_pool_empty_graph_yields_zero(rng):
    from gnn_tpu.ops import global_add_pool, global_max_pool

    gid = np.asarray([0, 0, 2], np.int32)  # graph 1 empty
    x = rng.normal(size=(3, 4)).astype(np.float32)
    mx = np.asarray(global_max_pool(jnp.asarray(x), jnp.asarray(gid), 3))
    np.testing.assert_array_equal(mx[1], np.zeros(4, np.float32))
    add = np.asarray(global_add_pool(jnp.asarray(x), jnp.asarray(gid), 3))
    np.testing.assert_array_equal(add[1], np.zeros(4, np.float32))


def test_global_pool_on_batch(rng):
    from gnn_tpu import graphs
    from gnn_tpu.graphs.generate import stochastic_block_model
    from gnn_tpu.ops import global_mean_pool

    ds = [stochastic_block_model(num_nodes=20 + 4 * i, num_classes=2, seed=i) for i in range(3)]
    batch = graphs.Batch(ds)
    pooled = np.asarray(
        global_mean_pool(batch.x, batch.graph_id, batch.num_graphs)
    )
    off = 0
    for i, d in enumerate(ds):
        np.testing.assert_allclose(
            pooled[i], np.asarray(d.x).mean(0), rtol=1e-5, atol=1e-6
        )
        off += d.num_nodes


# -- optimal ELL bucket widths (exact min-padding DP) --------------------------


def _cover_score(deg, buckets):
    """Rate-weighted predicted gather cost of a width set — the objective
    optimal_buckets minimizes (shared cover model of graphs/ell.py)."""
    from gnn_tpu.graphs.ell import _cover_table, _width_rate

    deg = np.asarray(deg, np.int64)
    deg = deg[deg > 0]
    kmax = int(np.asarray(buckets)[-1])
    _, _, cost = _cover_table(buckets)
    rem = deg % kmax
    return float(
        (deg // kmax).sum() * kmax * _width_rate(np.asarray([kmax]))[0]
        + cost[rem].sum()
    )


def test_optimal_buckets_no_worse_than_pow2(rng):
    from gnn_tpu.graphs.ell import optimal_buckets

    for trial in range(6):
        deg = rng.integers(0, 200, 400)
        if deg.max() == 0:
            continue
        got = optimal_buckets(deg)
        pow2 = tuple(
            w for w in (1, 2, 4, 8, 16, 32, 64, 128, 256, 512) if w <= got[-1]
        ) or (got[-1],)
        pow2 = tuple(sorted(set(pow2) | {got[-1]}))
        assert _cover_score(deg, got) <= _cover_score(deg, pow2) + 1e-9


def test_optimal_buckets_consumes_rate_table(monkeypatch):
    """VERDICT #6: the DP must actually read the measured per-width gather
    rates — poisoning widths 4 and 8 must change the chosen set."""
    import gnn_tpu.graphs.ell as ell_mod

    deg = np.full(500, 12, np.int64)
    default = ell_mod.optimal_buckets(deg)
    # Under the measured table a width-12 remainder covers as 8+4 (cheaper
    # than one padded width-16 row), so both small widths are in the set.
    assert {4, 8} <= set(default)
    monkeypatch.setattr(
        ell_mod,
        "_RATE_TABLE",
        ((1, 1.0), (2, 10.0), (4, 10.0), (8, 10.0), (16, 1.0), (512, 1.0)),
    )
    poisoned = ell_mod.optimal_buckets(deg)
    assert poisoned != default
    assert not ({4, 8} & set(poisoned))


def test_ell_two_piece_cover_matches_dense(rng):
    """A degree-12 node under buckets (4, 8, 16) covers as 8+4 (two rows,
    inv_light2 combine) — must match the dense oracle fwd + grad."""
    from gnn_tpu.graphs.ell import _cover_table

    w1, w2, _ = _cover_table((4, 8, 16))
    assert (w1[12], w2[12]) == (8, 4)
    n = 40
    src = np.concatenate([np.arange(12), rng.integers(0, n, 60)])
    dst = np.concatenate([np.full(12, 5), rng.integers(0, n, 60)])
    ei, _ = graphs.coalesce(np.stack([src, dst]), num_nodes=n)
    w = jnp.asarray(rng.normal(size=ei.shape[1]).astype(np.float32))
    adj = graphs.build_adjacency(
        ei, w, num_nodes=n, layout="ell", ell_buckets=(4, 8, 16)
    )
    assert adj.ell.inv_light2 is not None
    dense = np.asarray(graphs.to_dense_adj(ei, w, num_nodes=n))
    x = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    np.testing.assert_allclose(
        ops.spmm(adj, x, backend="ell"), dense @ np.asarray(x), rtol=1e-4, atol=1e-4
    )
    g = jax.grad(lambda x: jnp.sum(jnp.sin(ops.spmm(adj, x, backend="ell"))))(x)
    gd = jax.grad(lambda x: jnp.sum(jnp.sin(jnp.asarray(dense) @ x)))(x)
    np.testing.assert_allclose(g, gd, rtol=1e-4, atol=1e-4)


def test_ell_padding_bound_power_law():
    """The 2-piece cover keeps ELL padding under +12% on a power-law degree
    profile (round 1 single-piece aligned DP sat at +28%)."""
    from gnn_tpu.graphs.ell import build_ell, optimal_buckets

    rng = np.random.default_rng(0)
    n = 20000
    deg = np.minimum((rng.pareto(1.1, n) * 6).astype(np.int64) + 4, 5000)
    e = int(deg.sum())
    row_ptr = np.concatenate([[0], np.cumsum(deg)])
    col = rng.integers(0, n, e)
    ell = build_ell(
        row_ptr, col, np.arange(e), n, e, buckets=optimal_buckets(deg)
    )
    assert ell.num_slots / e <= 1.12, ell.num_slots / e


def test_optimal_buckets_edge_cases():
    from gnn_tpu.graphs.ell import optimal_buckets

    assert optimal_buckets(np.zeros(5, np.int64)) == (1,)
    assert optimal_buckets(np.asarray([8, 8, 8])) == (8,)
    bk = optimal_buckets(np.asarray([1, 1, 1, 600]))
    assert bk[-1] >= 512 and all(b == bk[0] or b % 8 == 0 or b in (1, 2, 4) for b in bk)
