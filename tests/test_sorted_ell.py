"""Tests for the combine-free contiguous degree-bucket ELL layout.

Oracle pattern per SURVEY.md §4: compute through the framework, recompute
with scipy/numpy dense-sparse arithmetic, compare elementwise.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy import sparse as sp

from gnn_tpu import graphs
from gnn_tpu.graphs.sorted_ell import (
    SUB,
    build_sorted_ell,
    degree_bucket_order,
)
from gnn_tpu.ops import spmm, spmm_edge_weighted


def _graph(N, E_dir, seed=0, hubs=0, self_loops=True):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, N, E_dir)
    dst = rng.integers(0, N, E_dir)
    ei = np.stack([src, dst])
    if hubs:  # connect each hub to every node: degree N-1 > kmax for N > 513
        for h in range(hubs):
            full = np.stack([np.arange(N), np.full(N, h)])
            ei = np.concatenate([ei, full], axis=1)
    ei, _ = graphs.to_undirected(ei, num_nodes=N)
    ei, w = graphs.gcn_norm(ei, num_nodes=N, self_loops=self_loops)
    return ei, np.asarray(w, np.float32)


def _csr(ei, w, N):
    return sp.coo_matrix(
        (w, (np.asarray(ei[1]), np.asarray(ei[0]))), shape=(N, N)
    ).tocsr()


@pytest.mark.parametrize("hubs", [0, 2])
def test_sorted_spmm_matches_dense_oracle(hubs):
    N = 600
    ei, w = _graph(N, 4000, seed=1, hubs=hubs)
    adj = graphs.build_adjacency(ei, jnp.asarray(w), num_nodes=N, reorder=True)
    assert adj.sorted_ell is not None and adj.perm is not None
    if hubs:  # forced hubs must exceed kmax and exercise the tail scatter
        assert int(adj.sorted_ell.tail_node.shape[0]) > 0
    perm = np.asarray(adj.perm)
    inv = np.empty(N, np.int64)
    inv[perm] = np.arange(N)
    x = np.random.default_rng(2).normal(size=(N, 16)).astype(np.float32)
    ref = _csr(ei, w, N) @ x
    out = np.asarray(spmm(adj, jnp.asarray(x[perm])))
    np.testing.assert_allclose(out[inv], ref, rtol=1e-4, atol=1e-5)


def test_sorted_spmm_grad_is_transpose_spmm():
    N = 400
    ei, w = _graph(N, 2500, seed=3)
    adj = graphs.build_adjacency(ei, jnp.asarray(w), num_nodes=N, reorder=True)
    perm = np.asarray(adj.perm)
    inv = np.empty(N, np.int64)
    inv[perm] = np.arange(N)
    x = np.random.default_rng(4).normal(size=(N, 8)).astype(np.float32)
    A = _csr(ei, w, N)
    dx = jax.grad(lambda xx: 0.5 * jnp.sum(spmm(adj, xx) ** 2))(
        jnp.asarray(x[perm])
    )
    np.testing.assert_allclose(
        np.asarray(dx)[inv], A.T @ (A @ x), rtol=1e-4, atol=1e-4
    )


def test_sorted_dynamic_weights_fwd_and_edge_grad():
    N = 300
    ei, w = _graph(N, 2000, seed=5)
    adj = graphs.build_adjacency(ei, jnp.asarray(w), num_nodes=N, reorder=True)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(N, 8)).astype(np.float32))
    wdyn = jnp.asarray(rng.random(adj.num_edges).astype(np.float32))
    srel, drel = np.asarray(adj.src), np.asarray(adj.dst)
    A = sp.coo_matrix((np.asarray(wdyn), (drel, srel)), shape=(N, N)).tocsr()
    out = np.asarray(spmm_edge_weighted(adj, wdyn, x))
    np.testing.assert_allclose(out, A @ np.asarray(x), rtol=1e-4, atol=1e-5)

    dw = jax.grad(
        lambda wd: 0.5 * jnp.sum(spmm_edge_weighted(adj, wd, x) ** 2)
    )(wdyn)
    y = A @ np.asarray(x)
    ref_dw = np.sum(y[drel] * np.asarray(x)[srel], axis=1)
    np.testing.assert_allclose(np.asarray(dw), ref_dw, rtol=1e-4, atol=1e-4)


def test_zero_degree_nodes_get_zero_rows():
    # nodes 10..19 isolated
    ei = np.stack([np.arange(10), np.roll(np.arange(10), 1)])
    ei, _ = graphs.to_undirected(ei, num_nodes=20)
    ei, w = graphs.gcn_norm(ei, num_nodes=20, self_loops=False)
    adj = graphs.build_adjacency(
        ei, jnp.asarray(np.asarray(w, np.float32)), num_nodes=20,
        layout="ell", reorder=True,
    )
    perm = np.asarray(adj.perm)
    inv = np.empty(20, np.int64)
    inv[perm] = np.arange(20)
    x = np.random.default_rng(0).normal(size=(20, 4)).astype(np.float32)
    out = np.asarray(spmm(adj, jnp.asarray(x[perm])))[inv]
    assert np.all(out[10:] == 0)
    ref = _csr(ei, np.asarray(w, np.float32), 20) @ x
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_reorder_requires_degree_symmetry():
    rng = np.random.default_rng(7)
    ei = np.stack([rng.integers(0, 50, 300), rng.integers(0, 50, 300)])
    with pytest.raises(ValueError, match="degree-symmetric"):
        graphs.build_adjacency(ei, num_nodes=50, reorder=True)
    adj = graphs.build_adjacency(ei, num_nodes=50, reorder="auto")
    assert adj.sorted_ell is None and adj.perm is None


def test_duplicate_self_loops_rejected():
    ei = np.asarray([[0, 0, 1], [0, 0, 1]])
    rp = np.asarray([2, 3, 3])
    with pytest.raises(ValueError, match="self-loops"):
        build_sorted_ell(
            np.asarray([0, 2, 3]), ei[0], np.arange(3), 2, 3
        )


def test_with_weight_refreshes_sorted_layout():
    N = 200
    ei, w = _graph(N, 1200, seed=8)
    adj = graphs.build_adjacency(ei, jnp.asarray(w), num_nodes=N, reorder=True)
    ones = jnp.ones((adj.num_edges,), jnp.float32)
    adj1 = adj.with_weight(ones)
    x = jnp.asarray(
        np.random.default_rng(9).normal(size=(N, 8)).astype(np.float32)
    )
    A1 = sp.coo_matrix(
        (np.ones(adj.num_edges), (np.asarray(adj.dst), np.asarray(adj.src))),
        shape=(N, N),
    ).tocsr()
    np.testing.assert_allclose(
        np.asarray(spmm(adj1, x)), A1 @ np.asarray(x), rtol=1e-4, atol=1e-5
    )


def test_transpose_swaps_sorted_layouts():
    N = 150
    ei, w = _graph(N, 900, seed=10)
    adj = graphs.build_adjacency(ei, jnp.asarray(w), num_nodes=N, reorder=True)
    x = jnp.asarray(
        np.random.default_rng(11).normal(size=(N, 8)).astype(np.float32)
    )
    at = adj.transpose()
    A = sp.coo_matrix(
        (np.asarray(adj.weight), (np.asarray(adj.dst), np.asarray(adj.src))),
        shape=(N, N),
    ).tocsr()
    np.testing.assert_allclose(
        np.asarray(spmm(at, x)), A.T @ np.asarray(x), rtol=1e-4, atol=1e-5
    )


def test_degree_bucket_order_is_stable_and_contiguous():
    deg = np.asarray([3, 0, 17, 3, 512, 24, 1])
    order = degree_bucket_order(deg)
    # zero-remainder nodes lead (node 1 deg 0; node 4 deg 512 iff kmax 512...
    # with max deg 512 the effective kmax is 512, so rem(512) == 0)
    assert order[0] in (1, 4) and order[1] in (1, 4)
    key_sorted = deg[order]
    # stability: equal-degree nodes keep relative order
    assert list(order).index(0) < list(order).index(3)


def test_sorted_layout_padding_is_tight():
    N = 2000
    ei, w = _graph(N, 14000, seed=12)
    adj = graphs.build_adjacency(ei, jnp.asarray(w), num_nodes=N, reorder=True)
    lay = adj.sorted_ell
    n_self = int((np.asarray(adj.src) == np.asarray(adj.dst)).sum())
    e_ns = adj.num_edges - n_self
    # width set {1..16} + multiples of SUB: padding stays in single digits
    assert lay.num_slots <= 1.12 * e_ns
    # every non-self edge is covered exactly once
    total_real = sum(
        int((np.asarray(b.slot_to_edge) != adj.num_edges).sum())
        for b in lay.narrow
    ) + int((np.asarray(lay.stream_edge) != adj.num_edges).sum())
    assert total_real == e_ns


def test_gcn_model_trains_on_sorted_layout():
    from gnn_tpu import nn, optim
    from gnn_tpu.graphs.generate import stochastic_block_model
    from gnn_tpu.models import GCN

    data = stochastic_block_model(num_nodes=300, num_classes=3, seed=13)
    ei, w = graphs.gcn_norm(
        np.asarray(data.edge_index), num_nodes=300, self_loops=True
    )
    adj = graphs.build_adjacency(
        ei, jnp.asarray(np.asarray(w, np.float32)), num_nodes=300, reorder=True
    )
    perm = np.asarray(adj.perm)
    x = jnp.asarray(np.asarray(data.x)[perm])
    y = jnp.asarray(np.asarray(data.y)[perm])
    mask = jnp.asarray(np.asarray(data.train_mask)[perm])
    model = GCN(int(data.x.shape[1]), 16, 3, key=jax.random.PRNGKey(0))
    params, static = nn.partition(model)
    opt = optim.adam(1e-2)
    ost = opt.init(params)

    @jax.jit
    def step(p, o):
        def lf(p):
            return nn.cross_entropy(
                nn.inference_mode(nn.combine(p, static))(x, adj), y, mask
            )

        l, g = jax.value_and_grad(lf)(p)
        u, o = opt.update(g, o, p)
        return optim.apply_updates(p, u), o, l

    losses = []
    for _ in range(30):
        params, ost, loss = step(params, ost)
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0]


def test_fit_reorder_matches_plain_training():
    from gnn_tpu.graphs.generate import stochastic_block_model
    from gnn_tpu.train.config import Config
    from gnn_tpu.train.loop import fit

    data = stochastic_block_model(num_nodes=250, num_classes=3, seed=2)
    base = {
        "train": {"epochs": 20, "eval_every": 10, "reorder": "true"},
        "model": {"name": "gcn", "hidden": 16, "dropout": 0.0},
    }
    _, _, h1 = fit(Config.from_dict(base), data, verbose=False)
    cfg2 = Config.from_dict(base).apply_overrides(["train.reorder=false"])
    _, _, h2 = fit(cfg2, data, verbose=False)
    for a, b in zip(h1, h2):
        # permutation changes only the float reduction order
        assert abs(a["loss"] - b["loss"]) < 2e-3
        assert abs(a["test_acc"] - b["test_acc"]) < 0.02


def test_fit_reorder_auto_on_gat():
    from gnn_tpu.graphs.generate import stochastic_block_model
    from gnn_tpu.train.config import Config
    from gnn_tpu.train.loop import fit

    data = stochastic_block_model(num_nodes=250, num_classes=3, seed=3)
    cfg = Config.from_dict(
        {
            "train": {"epochs": 25, "eval_every": 25},
            "model": {"name": "gat", "hidden": 16, "heads": 2, "dropout": 0.0},
        }
    )
    _, _, h = fit(cfg, data, verbose=False)
    assert h[-1]["test_acc"] > 0.8


def test_degree_exactly_effective_kmax():
    # star: hub degree 104 == effective kmax (a width multiple of 8), so the
    # hub's remainder is 0 — order and builder must agree it leads the order
    N = 120
    hub_edges = np.stack([np.arange(1, 105), np.full(104, 0)])
    ei, _ = graphs.to_undirected(hub_edges, num_nodes=N)
    ei, w = graphs.gcn_norm(ei, num_nodes=N, self_loops=False)
    adj = graphs.build_adjacency(
        ei, jnp.asarray(np.asarray(w, np.float32)), num_nodes=N,
        layout="ell", reorder=True,
    )
    assert int(adj.sorted_ell.tail_node.shape[0]) == 1  # the hub's full row
    perm = np.asarray(adj.perm)
    inv = np.empty(N, np.int64)
    inv[perm] = np.arange(N)
    x = np.random.default_rng(1).normal(size=(N, 4)).astype(np.float32)
    ref = _csr(ei, np.asarray(w, np.float32), N) @ x
    out = np.asarray(spmm(adj, jnp.asarray(x[perm])))[inv]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
