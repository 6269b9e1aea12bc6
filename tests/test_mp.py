"""Message-passing layer tests.

The reference has only a GCNConv smoke test and *no numeric correctness
test* (tests/graph.test.cpp:40-42; SURVEY.md §4). Here every layer gets a
golden-value check against the dense formulation.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gnn_tpu import graphs, nn
from gnn_tpu.mp import GCNConv, SAGEConv, GATConv, GINConv, MessagePassing

KEY = jax.random.PRNGKey(7)


def toy_graph(rng, n=12, e=40, f=6):
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    ei, _ = graphs.coalesce(np.stack([src, dst]), num_nodes=n)
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    data = graphs.Data(x=x, edge_index=ei, num_nodes=n)
    return data


def test_message_passing_default_hooks(rng):
    data = toy_graph(rng)
    adj = data.to_adjacency(add_self_loops=False, norm=None)

    class PlainSum(MessagePassing):
        pass

    out = PlainSum()(None) if False else PlainSum().propagate(adj, data.x)
    dense = np.asarray(data.to_dense_adj())
    np.testing.assert_allclose(out, dense @ np.asarray(data.x), rtol=1e-4, atol=1e-5)


def test_message_passing_mean_aggr(rng):
    data = toy_graph(rng)
    adj = data.to_adjacency(add_self_loops=False, norm=None)

    class MeanAgg(MessagePassing):
        pass

    out = np.asarray(MeanAgg(aggr="mean").propagate(adj, data.x))
    dense = np.asarray(data.to_dense_adj())
    deg = dense.sum(1, keepdims=True)
    want = (dense @ np.asarray(data.x)) / np.maximum(deg, 1)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_custom_message_hook(rng):
    """message() override sees x_i, x_j, edge_attr like the reference's
    variadic hooks (include/graph.h:114-116)."""
    data = toy_graph(rng)
    adj = data.to_adjacency(add_self_loops=False, norm=None)

    class DiffMP(MessagePassing):
        def message(self, x_i, x_j, edge_attr=None):
            return x_j - x_i

    out = np.asarray(DiffMP().propagate(adj, data.x))
    dense = np.asarray(data.to_dense_adj())
    x = np.asarray(data.x)
    want = dense @ x - dense.sum(1, keepdims=True) * x
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


def test_gcnconv_golden_vs_dense(rng):
    """GCNConv == D^-1/2 (A+I) D^-1/2 X W + b computed densely."""
    data = toy_graph(rng)
    conv = GCNConv(6, 4, key=KEY)
    adj = data.to_adjacency(norm="sym")
    got = np.asarray(conv(data.x, adj))

    A = np.array(data.to_dense_adj())
    np.fill_diagonal(A, 1.0)  # add_remaining_self_loops semantics
    d = A.sum(1)
    Dinv = np.diag(d**-0.5)
    H = np.asarray(data.x) @ np.asarray(conv.lin.weight).T
    want = Dinv @ A @ Dinv @ H + np.asarray(conv.bias)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_gcnconv_grad_vs_dense(rng):
    data = toy_graph(rng)
    conv = GCNConv(6, 4, key=KEY)
    adj = data.to_adjacency(norm="sym")

    A = np.array(data.to_dense_adj())
    np.fill_diagonal(A, 1.0)
    d = A.sum(1)
    norm_dense = jnp.asarray(np.diag(d**-0.5) @ A @ np.diag(d**-0.5), jnp.float32)

    params, static = nn.partition(conv)

    def loss_sparse(p):
        return jnp.sum(nn.combine(p, static)(data.x, adj) ** 2)

    def loss_dense(p):
        c = nn.combine(p, static)
        return jnp.sum((norm_dense @ c.lin(data.x) + c.bias) ** 2)

    gs = jax.grad(loss_sparse)(params)
    gd = jax.grad(loss_dense)(params)
    np.testing.assert_allclose(gs.lin.weight, gd.lin.weight, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(gs.bias, gd.bias, rtol=1e-3, atol=1e-3)


def test_gcnconv_mid_block_runs(rng):
    """Reference recipe XW -> BN -> ReLU -> aggregate -> +bias
    (src/graph.cpp:170-191)."""
    data = toy_graph(rng)
    conv, state = nn.make_with_state(GCNConv)(6, 4, key=KEY, mid_block=True, dropout=0.2)
    adj = data.to_adjacency(norm="sym")
    out, state2 = conv(data.x, adj, state, key=KEY)
    assert out.shape == (12, 4)
    assert np.isfinite(np.asarray(out)).all()
    # running stats updated
    m0, _ = state.get(conv.batch_norm.stats)
    m2, _ = state2.get(conv.batch_norm.stats)
    assert not np.allclose(m0, m2)


def test_sageconv_golden_mean(rng):
    data = toy_graph(rng)
    conv = SAGEConv(6, 4, key=KEY)
    adj = data.to_adjacency(add_self_loops=False, norm=None)
    got = np.asarray(conv(data.x, adj))

    dense = np.asarray(data.to_dense_adj())
    x = np.asarray(data.x)
    mean_agg = (dense @ x) / np.maximum(dense.sum(1, keepdims=True), 1)
    want = (
        x @ np.asarray(conv.lin_self.weight).T
        + np.asarray(conv.lin_self.bias)
        + mean_agg @ np.asarray(conv.lin_neigh.weight).T
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sageconv_bipartite(rng):
    """Sampled/bipartite form: distinct source and destination node sets."""
    src = np.array([0, 1, 2, 3])
    dst = np.array([0, 0, 1, 1])
    adj = graphs.build_adjacency(
        np.stack([src, dst]), num_src_nodes=4, num_dst_nodes=2
    )
    x_src = jnp.asarray(rng.normal(size=(4, 6)).astype(np.float32))
    x_dst = x_src[:2]
    conv = SAGEConv(6, 3, key=KEY)
    out = conv(x_src, adj, x_dst)
    assert out.shape == (2, 3)


def test_gatconv_attention_normalized(rng):
    data = toy_graph(rng)
    adj = data.to_adjacency(norm=None, add_self_loops=True)
    conv = GATConv(6, 4, key=KEY, heads=3)
    out, alpha = conv(data.x, adj, return_attention=True)
    assert out.shape == (12, 12)  # concat 3*4
    sums = np.zeros((12, 3))
    np.add.at(sums, np.asarray(adj.dst), np.asarray(alpha))
    np.testing.assert_allclose(sums, 1.0, rtol=1e-4)


def test_gatconv_single_head_golden(rng):
    """1-head GAT vs dense masked-softmax attention."""
    data = toy_graph(rng, n=8, e=20)
    adj = data.to_adjacency(norm=None, add_self_loops=True)
    conv = GATConv(6, 4, key=KEY, heads=1, use_bias=False)
    got = np.asarray(conv(data.x, adj))

    h = np.asarray(conv.lin(data.x))  # [N, 4]
    a_src = np.asarray(conv.att_src)[0]
    a_dst = np.asarray(conv.att_dst)[0]
    mask = (np.asarray(graphs.to_dense_adj(adj.edge_index, num_nodes=8)) > 0)
    scores = (h @ a_dst)[:, None] + (h @ a_src)[None, :]  # [dst, src]
    scores = np.where(scores > 0, scores, 0.2 * scores)  # leaky relu
    scores = np.where(mask, scores, -np.inf)
    scores = scores - scores.max(1, keepdims=True)
    att = np.exp(scores) / np.maximum(np.exp(scores).sum(1, keepdims=True), 1e-16)
    att = np.where(mask, att, 0.0)
    want = att @ h
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_gatconv_fused_wide_segment_scales(rng):
    """Fused (chunk-plan) path must use a PER-SEGMENT max shift.

    Per-segment logit scales span far more than 40 units here; with a
    global max shift, every segment whose logits sit below the max by
    ~>80 units underflows to exp()=0 and the denominator guard zeroes the
    node's output. The csr-path (per-segment segment_softmax) is the
    oracle."""
    n, e, f = 24, 90, 6
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    ei, _ = graphs.coalesce(np.stack([src, dst]), num_nodes=n)
    ei, _ = graphs.add_self_loops(ei, num_nodes=n)
    # Per-node feature scales spanning 4 orders of magnitude -> per-segment
    # attention-logit scales spanning hundreds of units.
    scale = np.where(np.arange(n) % 2 == 0, 60.0, 0.05).astype(np.float32)
    x = jnp.asarray(
        rng.normal(size=(n, f)).astype(np.float32) * scale[:, None]
    )
    adj_fused = graphs.build_adjacency(ei, num_nodes=n, layout="ell")
    adj_ref = graphs.build_adjacency(ei, num_nodes=n, layout="csr")
    assert adj_fused.chunk_plan is not None and adj_ref.chunk_plan is None
    conv = GATConv(6, 4, key=KEY, heads=2, use_bias=False)
    got = np.asarray(conv(x, adj_fused))
    want = np.asarray(conv(x, adj_ref))
    # Old global-shift code returns ~0 rows for all low-scale segments.
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    row_norms = np.linalg.norm(want, axis=1)
    assert (np.linalg.norm(got, axis=1) > 0.5 * row_norms).all()


def test_ginconv_runs_and_grads(rng):
    data = toy_graph(rng)
    adj = data.to_adjacency(add_self_loops=False, norm=None)
    conv = GINConv(6, [8, 4], key=KEY, train_eps=True)
    out = conv(data.x, adj)
    assert out.shape == (12, 4)
    params, static = nn.partition(conv)
    g = jax.grad(lambda p: jnp.sum(nn.combine(p, static)(data.x, adj) ** 2))(params)
    assert float(jnp.abs(g.eps)) > 0  # eps receives gradient when trainable


def test_data_container_invariants(rng):
    """Data ctor checks (reference src/graph.cpp:77-100) + masks."""
    import pytest

    data = toy_graph(rng)
    with pytest.raises(ValueError):
        graphs.Data(x=data.x, edge_index=data.edge_index, num_nodes=5)
    mask = np.zeros(12, bool)
    mask[:5] = True
    d2 = data.set_mask(jnp.asarray(mask), graphs.TRAIN)
    assert int(d2.train_mask.sum()) == 5
    with pytest.raises(ValueError):
        data.set_mask(jnp.asarray(mask), "bogus")


def test_batch_block_diagonal(rng):
    g1 = toy_graph(rng, n=5, e=10)
    g2 = toy_graph(rng, n=7, e=14)
    b = graphs.Batch([g1, g2])
    assert b.num_nodes == 12
    assert b.num_graphs == 2
    # no cross-graph edges
    ei = np.asarray(b.edge_index)
    gid = np.asarray(b.graph_id)
    assert (gid[ei[0]] == gid[ei[1]]).all()


def test_data_rejects_out_of_range_edges(rng):
    import pytest

    x = jnp.ones((4, 2))
    with pytest.raises(ValueError, match="references node"):
        graphs.Data(x=x, edge_index=np.array([[0, 1, 500], [1, 2, 3]]), num_nodes=4)
    with pytest.raises(ValueError, match="references node"):
        graphs.Data(x=x, edge_index=np.array([[-1], [0]]), num_nodes=4)


def test_gat_bf16_messages_close_to_f32(rng):
    """message_dtype=bfloat16 keeps outputs within bf16-grade tolerance of
    the f32 path (scores/softmax/denominator stay f32)."""
    import jax
    import jax.numpy as jnp

    from gnn_tpu import graphs
    from gnn_tpu.mp.gat import GATConv

    n, e = 300, 4000
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    ei, _ = graphs.to_undirected(ei, num_nodes=n)
    adj = graphs.build_adjacency(ei, num_nodes=n, layout="ell")
    x = jnp.asarray(rng.normal(size=(n, 32)).astype(np.float32))
    key = jax.random.PRNGKey(3)
    conv32 = GATConv(32, 8, heads=4, key=key)
    convbf = GATConv(32, 8, heads=4, key=key, message_dtype=jnp.bfloat16)
    o32 = np.asarray(conv32(x, adj))
    obf = np.asarray(convbf(x, adj))
    scale = np.abs(o32).max()
    assert np.abs(obf - o32).max() < 0.03 * scale
    # and it trains: grads exist and are finite
    g = jax.grad(lambda x: float(0) + jnp.sum(convbf(x, adj) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()
