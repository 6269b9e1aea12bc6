"""Multi-chip tests on the fake 8-device CPU mesh (SURVEY.md §4: shard_map
code runs unchanged on real TPU slices). The key property the reference
could never test: sharded results must be allclose to single-chip results.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_tpu import graphs, nn, optim, ops, parallel
from gnn_tpu.graphs.generate import stochastic_block_model
from gnn_tpu.parallel import (
    make_mesh,
    partition_graph,
    spmm_dist,
    shard_node_array,
)

pytestmark = pytest.mark.slow  # 8-device mesh compiles; run via pytest -m ''

KEY = jax.random.PRNGKey(0)


def make_graph(rng, n=100, e=600):
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    ei, _ = graphs.coalesce(np.stack([src, dst]), num_nodes=n)
    ei, w = graphs.gcn_norm(ei, num_nodes=n)
    x = rng.normal(size=(n, 16)).astype(np.float32)
    return ei, w, x, n


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(axes=("data",))


def test_spmm_dist_matches_dense(rng, mesh):
    ei, w, x, n = make_graph(rng)
    P_ = mesh.shape["data"]
    dist = partition_graph(ei, w, num_nodes=n, num_parts=P_)
    x_sh = shard_node_array(dist, x, mesh)
    out = np.asarray(dist.unshard_nodes(spmm_dist(dist, x_sh, mesh)))
    dense = np.asarray(graphs.to_dense_adj(ei, w, num_nodes=n))
    np.testing.assert_allclose(out, dense @ x, rtol=1e-4, atol=1e-4)


def test_spmm_dist_grad_matches_dense(rng, mesh):
    ei, w, x, n = make_graph(rng)
    dist = partition_graph(ei, w, num_nodes=n, num_parts=mesh.shape["data"])
    x_sh = shard_node_array(dist, x, mesh)
    dense = jnp.asarray(np.asarray(graphs.to_dense_adj(ei, w, num_nodes=n)))

    g_dist = jax.grad(
        lambda xs: jnp.sum(jnp.sin(spmm_dist(dist, xs, mesh)))
    )(x_sh)
    g_dense = jax.grad(lambda x: jnp.sum(jnp.sin(dense @ x)))(jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(dist.unshard_nodes(g_dist)), g_dense, rtol=1e-4, atol=1e-4
    )


def test_spmm_dist_under_jit(rng, mesh):
    ei, w, x, n = make_graph(rng)
    dist = partition_graph(ei, w, num_nodes=n, num_parts=mesh.shape["data"])
    x_sh = shard_node_array(dist, x, mesh)

    f = jax.jit(lambda xs: spmm_dist(dist, xs, mesh))
    out = np.asarray(dist.unshard_nodes(f(x_sh)))
    dense = np.asarray(graphs.to_dense_adj(ei, w, num_nodes=n))
    np.testing.assert_allclose(out, dense @ x, rtol=1e-4, atol=1e-4)


def test_spmm_dist_uneven_nodes(rng, mesh):
    """N not divisible by P: padding rows must stay inert."""
    ei, w, x, n = make_graph(rng, n=101, e=500)
    dist = partition_graph(ei, w, num_nodes=n, num_parts=mesh.shape["data"])
    x_sh = shard_node_array(dist, x, mesh)
    out = np.asarray(dist.unshard_nodes(spmm_dist(dist, x_sh, mesh)))
    dense = np.asarray(graphs.to_dense_adj(ei, w, num_nodes=n))
    np.testing.assert_allclose(out, dense @ x, rtol=1e-4, atol=1e-4)


def test_sharded_gcn_training_step_matches_single_chip(rng, mesh):
    """Full train step: sharded loss + grads allclose to single-device."""
    data = stochastic_block_model(num_nodes=120, num_classes=3, seed=11)
    from gnn_tpu.models import GCN

    ei, w = graphs.gcn_norm(
        np.asarray(data.edge_index), num_nodes=data.num_nodes
    )
    adj = graphs.build_adjacency(ei, jnp.asarray(w), num_nodes=data.num_nodes)
    dist = partition_graph(
        ei, w, num_nodes=data.num_nodes, num_parts=mesh.shape["data"]
    )

    model = GCN(16, 8, 3, key=KEY, dropout=0.0)
    params, static = nn.partition(model)

    # single chip
    def loss_single(p):
        logits = nn.combine(p, static)(data.x, adj)
        return nn.cross_entropy(logits, data.y, data.train_mask)

    # sharded: spmm_dist substituted via the model's adj argument is not
    # possible (GCNConv calls ops.spmm), so run layers manually.
    x_sh = shard_node_array(dist, data.x, mesh)
    y_sh = dist.shard_nodes(data.y)
    mask_sh = dist.shard_nodes(data.train_mask, fill=False)

    def loss_dist(p):
        m = nn.combine(p, static)
        h = x_sh
        for i, conv in enumerate(m.convs):
            h = spmm_dist(dist, conv.lin(h), mesh) + conv.bias
            if i < len(m.convs) - 1:
                h = nn.relu(h)
        return nn.cross_entropy(h, y_sh, mask_sh)

    l1, g1 = jax.value_and_grad(loss_single)(params)
    l2, g2 = jax.value_and_grad(loss_dist)(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_partition_heavy_hub(rng, mesh):
    """A hub node with high degree partitions correctly."""
    n = 64
    src = np.concatenate([np.arange(n), rng.integers(0, n, 100)])
    dst = np.concatenate([np.zeros(n, np.int64), rng.integers(0, n, 100)])
    ei, _ = graphs.coalesce(np.stack([src, dst]), num_nodes=n)
    dist = partition_graph(ei, None, num_nodes=n, num_parts=mesh.shape["data"])
    x = rng.normal(size=(n, 4)).astype(np.float32)
    x_sh = shard_node_array(dist, x, mesh)
    out = np.asarray(dist.unshard_nodes(spmm_dist(dist, x_sh, mesh)))
    dense = np.asarray(graphs.to_dense_adj(ei, num_nodes=n))
    np.testing.assert_allclose(out, dense @ x, rtol=1e-4, atol=1e-4)


def test_gcn_model_transparent_dist(rng, mesh):
    """models.GCN runs unchanged on a DistGraph (spmm dispatches)."""
    from gnn_tpu.models import GCN

    data = stochastic_block_model(num_nodes=96, num_classes=3, seed=13)
    ei, w = graphs.gcn_norm(np.asarray(data.edge_index), num_nodes=data.num_nodes)
    adj = graphs.build_adjacency(ei, jnp.asarray(w), num_nodes=data.num_nodes)
    dist = partition_graph(ei, w, num_nodes=data.num_nodes, mesh=mesh)

    model = GCN(16, 8, 3, key=KEY, dropout=0.0)
    logits_single = np.asarray(model(data.x, adj))
    x_sh = shard_node_array(dist, data.x, mesh)
    logits_dist = np.asarray(dist.unshard_nodes(model(x_sh, dist)))
    np.testing.assert_allclose(logits_dist, logits_single, rtol=1e-3, atol=1e-4)


# -- targeted all-to-all halo exchange (v2) ---------------------------------


def test_alltoall_matches_dense(rng, mesh):
    ei, w, x, n = make_graph(rng)
    dist = partition_graph(
        ei, w, num_nodes=n, mesh=mesh, halo="alltoall"
    )
    assert dist.send_idx is not None and dist.h_max > 0
    x_sh = shard_node_array(dist, x, mesh)
    out = np.asarray(dist.unshard_nodes(spmm_dist(dist, x_sh, mesh)))
    dense = np.asarray(graphs.to_dense_adj(ei, w, num_nodes=n))
    np.testing.assert_allclose(out, dense @ x, rtol=1e-4, atol=1e-4)


def test_alltoall_matches_allgather(rng, mesh):
    ei, w, x, n = make_graph(rng, n=120, e=800)
    d1 = partition_graph(ei, w, num_nodes=n, mesh=mesh, halo="allgather")
    d2 = partition_graph(ei, w, num_nodes=n, mesh=mesh, halo="alltoall")
    x1 = shard_node_array(d1, x, mesh)
    o1 = np.asarray(d1.unshard_nodes(spmm_dist(d1, x1, mesh)))
    o2 = np.asarray(d2.unshard_nodes(spmm_dist(d2, x1, mesh)))
    np.testing.assert_allclose(o1, o2, rtol=1e-4, atol=1e-5)


def test_alltoall_grad_matches_dense(rng, mesh):
    ei, w, x, n = make_graph(rng)
    dist = partition_graph(ei, w, num_nodes=n, mesh=mesh, halo="alltoall")
    x_sh = shard_node_array(dist, x, mesh)
    dense = jnp.asarray(np.asarray(graphs.to_dense_adj(ei, w, num_nodes=n)))
    g_dist = jax.grad(lambda xs: jnp.sum(jnp.sin(spmm_dist(dist, xs, mesh))))(x_sh)
    g_dense = jax.grad(lambda x: jnp.sum(jnp.sin(dense @ x)))(jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(dist.unshard_nodes(g_dist)), g_dense, rtol=1e-4, atol=1e-4
    )


def test_alltoall_gcn_model(rng, mesh):
    from gnn_tpu.models import GCN

    data = stochastic_block_model(num_nodes=96, num_classes=3, seed=17)
    ei, w = graphs.gcn_norm(np.asarray(data.edge_index), num_nodes=data.num_nodes)
    adj = graphs.build_adjacency(ei, jnp.asarray(w), num_nodes=data.num_nodes)
    dist = partition_graph(
        ei, w, num_nodes=data.num_nodes, mesh=mesh, halo="alltoall"
    )
    model = GCN(16, 8, 3, key=KEY, dropout=0.0)
    single = np.asarray(model(data.x, adj))
    x_sh = shard_node_array(dist, data.x, mesh)
    out = np.asarray(dist.unshard_nodes(model(x_sh, dist)))
    np.testing.assert_allclose(out, single, rtol=1e-3, atol=1e-4)


# -- overlapped halo exchange (v3: local/remote edge split) ------------------


def test_overlap_matches_dense(rng, mesh):
    ei, w, x, n = make_graph(rng)
    dist = partition_graph(ei, w, num_nodes=n, mesh=mesh, halo="overlap")
    assert dist.ell_rem is not None and dist.send_idx is not None
    x_sh = shard_node_array(dist, x, mesh)
    out = np.asarray(dist.unshard_nodes(spmm_dist(dist, x_sh, mesh)))
    dense = np.asarray(graphs.to_dense_adj(ei, w, num_nodes=n))
    np.testing.assert_allclose(out, dense @ x, rtol=1e-4, atol=1e-4)


def test_overlap_grad_matches_dense(rng, mesh):
    ei, w, x, n = make_graph(rng)
    dist = partition_graph(ei, w, num_nodes=n, mesh=mesh, halo="overlap")
    x_sh = shard_node_array(dist, x, mesh)
    dense = jnp.asarray(np.asarray(graphs.to_dense_adj(ei, w, num_nodes=n)))
    g_dist = jax.grad(lambda xs: jnp.sum(jnp.sin(spmm_dist(dist, xs, mesh))))(x_sh)
    g_dense = jax.grad(lambda x: jnp.sum(jnp.sin(dense @ x)))(jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(dist.unshard_nodes(g_dist)), g_dense, rtol=1e-4, atol=1e-4
    )


def test_overlap_gcn_model(rng, mesh):
    from gnn_tpu.models import GCN

    data = stochastic_block_model(num_nodes=96, num_classes=3, seed=17)
    ei, w = graphs.gcn_norm(np.asarray(data.edge_index), num_nodes=data.num_nodes)
    adj = graphs.build_adjacency(ei, jnp.asarray(w), num_nodes=data.num_nodes)
    dist = partition_graph(
        ei, w, num_nodes=data.num_nodes, mesh=mesh, halo="overlap"
    )
    model = GCN(16, 8, 3, key=KEY, dropout=0.0)
    single = np.asarray(model(data.x, adj))
    x_sh = shard_node_array(dist, data.x, mesh)
    out = np.asarray(dist.unshard_nodes(model(x_sh, dist)))
    np.testing.assert_allclose(out, single, rtol=1e-3, atol=1e-4)


# -- local_blocked: per-chip MXU diagonal blocks (distributed blocked.py) ----


def _clustered_graph(rng, n=120, pack_rows=16):
    """SBM relabeled by the community-packing order, GCN-normalized."""
    data = stochastic_block_model(num_nodes=n, num_classes=4, seed=23)
    ei = np.asarray(data.edge_index)
    perm = graphs.cluster_order(ei, n, pack_rows=pack_rows)
    old2new = np.empty(n, np.int64)
    old2new[perm] = np.arange(n)
    ei = old2new[ei]
    ei, w = graphs.gcn_norm(ei, num_nodes=n)
    x = rng.normal(size=(n, 16)).astype(np.float32)
    return ei, w, x, n


def test_local_blocked_matches_dense(rng, mesh):
    ei, w, x, n = _clustered_graph(rng)
    dist = partition_graph(
        ei, w, num_nodes=n, mesh=mesh, halo="overlap", local_blocked=16
    )
    assert dist.diag is not None and dist.block_rows == 16
    # the packing order must give the windows real community capture
    assert float(jnp.sum(dist.diag != 0)) > 0.3 * len(ei[0])
    x_sh = shard_node_array(dist, x, mesh)
    out = np.asarray(dist.unshard_nodes(spmm_dist(dist, x_sh, mesh)))
    dense = np.asarray(graphs.to_dense_adj(ei, w, num_nodes=n))
    np.testing.assert_allclose(out, dense @ x, rtol=1e-4, atol=1e-4)


def test_local_blocked_grad_matches_dense(rng, mesh):
    ei, w, x, n = _clustered_graph(rng)
    dist = partition_graph(
        ei, w, num_nodes=n, mesh=mesh, halo="overlap", local_blocked=16
    )
    x_sh = shard_node_array(dist, x, mesh)
    dense = jnp.asarray(np.asarray(graphs.to_dense_adj(ei, w, num_nodes=n)))
    g_dist = jax.grad(lambda xs: jnp.sum(jnp.sin(spmm_dist(dist, xs, mesh))))(x_sh)
    g_dense = jax.grad(lambda x: jnp.sum(jnp.sin(dense @ x)))(jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(dist.unshard_nodes(g_dist)), g_dense, rtol=1e-4, atol=1e-4
    )


def test_local_blocked_uneven_nodes(rng, mesh):
    """N not divisible by P*R: window-aligned padding rows must stay inert."""
    ei, w, x, n = _clustered_graph(rng, n=117)
    dist = partition_graph(
        ei, w, num_nodes=n, mesh=mesh, halo="overlap", local_blocked=16
    )
    assert dist.n_max % 16 == 0
    x_sh = shard_node_array(dist, x, mesh)
    out = np.asarray(dist.unshard_nodes(spmm_dist(dist, x_sh, mesh)))
    dense = np.asarray(graphs.to_dense_adj(ei, w, num_nodes=n))
    np.testing.assert_allclose(out, dense @ x, rtol=1e-4, atol=1e-4)


def test_local_blocked_gcn_model(rng, mesh):
    from gnn_tpu.models import GCN

    ei, w, x, n = _clustered_graph(rng)
    adj = graphs.build_adjacency(ei, jnp.asarray(w), num_nodes=n)
    dist = partition_graph(
        ei, w, num_nodes=n, mesh=mesh, halo="overlap", local_blocked=16
    )
    model = GCN(16, 8, 3, key=KEY, dropout=0.0)
    single = np.asarray(model(jnp.asarray(x), adj))
    x_sh = shard_node_array(dist, x, mesh)
    out = np.asarray(dist.unshard_nodes(model(x_sh, dist)))
    np.testing.assert_allclose(out, single, rtol=1e-3, atol=1e-4)


def test_local_blocked_requires_overlap(rng):
    ei = np.asarray([[0, 1], [1, 0]])
    with pytest.raises(ValueError, match="overlap"):
        partition_graph(
            ei, None, num_nodes=2, num_parts=2, halo="alltoall", local_blocked=16
        )


# -- edge-parallel primitives: dynamic weights, GAT, SAGE over DistGraph -----

HALO_MODES = ("allgather", "alltoall", "overlap")


@pytest.mark.parametrize("halo", HALO_MODES)
def test_gather_src_dist_matches(rng, mesh, halo):
    ei, w, x, n = make_graph(rng)
    dist = partition_graph(ei, None, num_nodes=n, mesh=mesh, halo=halo)
    x_sh = shard_node_array(dist, x, mesh)
    got = np.asarray(parallel.gather_src_dist(dist, x_sh))
    valid = np.asarray(parallel.edge_valid_mask(dist))
    eid = np.asarray(dist.edge_id).reshape(-1)
    # Every real edge's slot holds x[src_e]; padding slots are zero.
    np.testing.assert_allclose(got[valid], x[ei[0][eid[valid]]], rtol=1e-6)
    assert np.all(got[~valid] == 0)


@pytest.mark.parametrize("halo", HALO_MODES)
def test_gather_src_dist_grad(rng, mesh, halo):
    """The custom VJP (incidence ELL + reverse exchange) vs dense oracle."""
    ei, _, x, n = make_graph(rng, n=80, e=400)
    dist = partition_graph(ei, None, num_nodes=n, mesh=mesh, halo=halo)
    x_sh = shard_node_array(dist, x, mesh)

    g_dist = jax.grad(
        lambda xs: jnp.sum(jnp.sin(parallel.gather_src_dist(dist, xs)))
    )(x_sh)
    g_ref = jax.grad(
        lambda xx: jnp.sum(jnp.sin(jnp.take(xx, jnp.asarray(ei[0]), axis=0)))
    )(jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(dist.unshard_nodes(g_dist)), g_ref, rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("halo", HALO_MODES)
def test_spmm_edge_weighted_dist(rng, mesh, halo):
    """Dynamic-weight SpMM over the mesh: fwd + grads wrt x AND w."""
    ei, _, x, n = make_graph(rng)
    # Canonical order here = the adjacency's dst-sorted order, so the same
    # weight vector drives both the single-chip and distributed paths.
    adj = graphs.build_adjacency(ei, num_nodes=n, layout="csr")
    ei2 = np.stack([np.asarray(adj.src), np.asarray(adj.dst)])
    e = ei2.shape[1]
    wdyn = jnp.asarray(rng.normal(size=(e,)).astype(np.float32))
    dist = partition_graph(ei2, None, num_nodes=n, mesh=mesh, halo=halo)
    x_sh = shard_node_array(dist, x, mesh)

    def loss_single(w_, x_):
        return jnp.sum(jnp.sin(ops.spmm_edge_weighted(adj, w_, x_)))

    def loss_dist(w_, x_):
        w_loc = dist.shard_edge_array(w_)
        out = ops.spmm_edge_weighted(dist, w_loc, x_)
        return jnp.sum(jnp.sin(dist.unshard_nodes(out)))

    l1 = loss_single(wdyn, jnp.asarray(x))
    l2 = loss_dist(wdyn, x_sh)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    gw1, gx1 = jax.grad(loss_single, argnums=(0, 1))(wdyn, jnp.asarray(x))
    gw2, gx2 = jax.grad(loss_dist, argnums=(0, 1))(wdyn, x_sh)
    np.testing.assert_allclose(np.asarray(gw2), np.asarray(gw1), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(dist.unshard_nodes(gx2)), np.asarray(gx1), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("halo", HALO_MODES)
def test_gat_dist_matches_single_chip(rng, mesh, halo):
    """GATConv on a DistGraph: fwd + param grads vs the single-chip layer."""
    from gnn_tpu.mp import GATConv

    ei, _, x, n = make_graph(rng, n=96, e=500)
    ei, _ = graphs.add_self_loops(ei, num_nodes=n)
    adj = graphs.build_adjacency(ei, num_nodes=n, layout="csr")
    dist = partition_graph(ei, None, num_nodes=n, mesh=mesh, halo=halo)
    conv = GATConv(16, 6, key=KEY, heads=2)
    x_sh = shard_node_array(dist, x, mesh)

    single = np.asarray(conv(jnp.asarray(x), adj))
    out = np.asarray(dist.unshard_nodes(conv(x_sh, dist)))
    np.testing.assert_allclose(out, single, rtol=1e-3, atol=1e-4)

    params, static = nn.partition(conv)

    def loss_single(p):
        return jnp.sum(jnp.sin(nn.combine(p, static)(jnp.asarray(x), adj)))

    def loss_dist(p):
        out = nn.combine(p, static)(x_sh, dist)
        return jnp.sum(jnp.sin(dist.unshard_nodes(out)))

    g1 = jax.grad(loss_single)(params)
    g2 = jax.grad(loss_dist)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("aggr", ("mean", "sum", "max"))
def test_sage_dist_matches_single_chip(rng, mesh, aggr):
    from gnn_tpu.mp import SAGEConv

    ei, _, x, n = make_graph(rng, n=96, e=500)
    adj = graphs.build_adjacency(ei, num_nodes=n, layout="csr")
    dist = partition_graph(ei, None, num_nodes=n, mesh=mesh, halo="alltoall")
    conv = SAGEConv(16, 8, key=KEY, aggr=aggr)
    x_sh = shard_node_array(dist, x, mesh)

    single = np.asarray(conv(jnp.asarray(x), adj))
    out = np.asarray(dist.unshard_nodes(conv(x_sh, dist)))
    np.testing.assert_allclose(out, single, rtol=1e-3, atol=1e-4)

    params, static = nn.partition(conv)

    def loss_single(p):
        return jnp.sum(jnp.sin(nn.combine(p, static)(jnp.asarray(x), adj)))

    def loss_dist(p):
        out = nn.combine(p, static)(x_sh, dist)
        return jnp.sum(jnp.sin(dist.unshard_nodes(out)))

    g1 = jax.grad(loss_single)(params)
    g2 = jax.grad(loss_dist)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-4)


def test_sage_dist_weighted_partition_matches_single_chip(rng, mesh):
    """SAGE mean on a weight-baked partition folds the weights exactly like
    the single-chip path (weighted message sum / edge count) — the r4
    semantics that let fit()'s sym-norm partition serve SAGE unchanged.
    Weighted max still rejects (weights aren't exposed edge-parallel)."""
    from gnn_tpu.mp import SAGEConv

    ei, w, x, n = make_graph(rng)
    dist = partition_graph(ei, w, num_nodes=n, mesh=mesh)
    adj = graphs.build_adjacency(ei, jnp.asarray(w), num_nodes=n, layout="csr")
    conv = SAGEConv(16, 8, key=KEY, aggr="mean")
    x_sh = shard_node_array(dist, x, mesh)
    out = np.asarray(dist.unshard_nodes(conv(x_sh, dist)))
    single = np.asarray(conv(jnp.asarray(x), adj))
    np.testing.assert_allclose(out, single, rtol=1e-4, atol=1e-5)
    conv_max = SAGEConv(16, 8, key=KEY, aggr="max")
    with pytest.raises(ValueError, match="max"):
        conv_max(x_sh, dist)


def _collect_eqns(jaxpr, out):
    """Flatten a jaxpr and all sub-jaxprs into one eqn list."""
    out.extend(jaxpr.eqns)
    for eqn in jaxpr.eqns:
        for v in eqn.params.values():
            if hasattr(v, "jaxpr"):  # ClosedJaxpr
                _collect_eqns(v.jaxpr, out)
            elif hasattr(v, "eqns"):  # raw Jaxpr
                _collect_eqns(v, out)


def test_overlap_local_matvec_independent_of_collective(rng, mesh):
    """Verify the 'overlap' claim structurally (VERDICT r1 item 8): in the
    traced program, the LOCAL ELL matvec must not (transitively) consume the
    all_to_all's output — only the remote matvec may. That is the data
    dependence XLA's latency-hiding scheduler needs to run the local
    aggregation while the exchange is in flight."""
    ei, w, x, n = make_graph(rng)
    dist = partition_graph(ei, w, num_nodes=n, mesh=mesh, halo="overlap")
    x_sh = shard_node_array(dist, x, mesh)
    jaxpr = jax.make_jaxpr(lambda xs: spmm_dist(dist, xs, mesh))(x_sh)

    eqns = []
    _collect_eqns(jaxpr.jaxpr, eqns)
    a2a = [e for e in eqns if e.primitive.name == "all_to_all"]
    assert len(a2a) >= 1, "overlap mode must exchange via all_to_all"

    # Taint-propagate from the all_to_all outputs through every eqn.
    tainted = {id(v) for e in a2a for v in e.outvars}
    changed = True
    while changed:
        changed = False
        for e in eqns:
            if any(id(v) in tainted for v in e.invars if hasattr(v, "aval")):
                for v in e.outvars:
                    if id(v) not in tainted:
                        tainted.add(id(v))
                        changed = True

    # The combining adds: one side tainted (remote), one side clean (local).
    adds = [
        e
        for e in eqns
        if e.primitive.name == "add"
        and len(e.invars) == 2
        and all(hasattr(v, "aval") and v.aval.ndim == 2 for v in e.invars)
        and any(id(v) in tainted for v in e.invars)
        and any(id(v) not in tainted for v in e.invars)
    ]
    assert adds, (
        "no local+remote combining add found: the local matvec appears to "
        "depend on the all_to_all (overlap impossible)"
    )


@pytest.mark.parametrize("model_name", ("gcn", "sage", "gat", "gin"))
def test_distributed_fit_matches_single_chip(rng, mesh, model_name):
    """The real training loop, multi-chip, for the WHOLE stateless model
    family: loss/accuracy step-for-step equal to the single-chip run
    (VERDICT r1 item 4; r3 item 2 extended this to every MessagePassing
    family — EncoderGCN's stateful variant has its own test below)."""
    from gnn_tpu.train import Config, fit

    data = stochastic_block_model(num_nodes=120, num_classes=3, seed=31)
    cfg = Config()
    cfg.model.name = model_name
    cfg.model.hidden = 8
    cfg.model.heads = 2
    cfg.model.dropout = 0.0
    cfg.optim.lr = 0.01
    cfg.train.epochs = 6
    cfg.train.eval_every = 2
    _, _, hist_single = fit(cfg, data, verbose=False)

    cfg2 = Config.from_json(cfg.to_json())
    cfg2.dist.num_parts = 8
    _, _, hist_dist = fit(cfg2, data, verbose=False)

    assert len(hist_single) == len(hist_dist) > 0
    for m1, m2 in zip(hist_single, hist_dist):
        np.testing.assert_allclose(m1["loss"], m2["loss"], rtol=1e-4)
        for k in ("train_acc", "val_acc", "test_acc"):
            if k in m1:
                np.testing.assert_allclose(m1[k], m2[k], atol=1e-6)


def test_distributed_fit_local_blocked_matches_single_chip(rng, mesh):
    """fit() with dist.local_blocked: the cluster-packed order + per-chip
    MXU blocks must not move loss/accuracy vs the single-chip run."""
    from gnn_tpu.train import Config, fit

    data = stochastic_block_model(num_nodes=120, num_classes=3, seed=31)
    cfg = Config()
    cfg.model.name = "gcn"
    cfg.model.hidden = 8
    cfg.model.dropout = 0.0
    cfg.optim.lr = 0.01
    cfg.train.epochs = 6
    cfg.train.eval_every = 2
    _, _, hist_single = fit(cfg, data, verbose=False)

    cfg2 = Config.from_json(cfg.to_json())
    cfg2.dist.num_parts = 8
    cfg2.dist.local_blocked = 8
    _, _, hist_dist = fit(cfg2, data, verbose=False)

    assert len(hist_single) == len(hist_dist) > 0
    for m1, m2 in zip(hist_single, hist_dist):
        np.testing.assert_allclose(m1["loss"], m2["loss"], rtol=1e-4)
        for k in ("train_acc", "val_acc", "test_acc"):
            if k in m1:
                np.testing.assert_allclose(m1[k], m2[k], atol=1e-6)


def test_distributed_fit_encoder_gcn_matches_single_chip(rng, mesh):
    """The reference flagship (EncoderGCN, main.cpp:10-30, with the
    hard-wired BatchNorm mid-block of src/graph.cpp:160-175) trains
    distributed: mask-aware batch statistics exclude the padding rows, so
    loss/accuracy match the single-chip run step-for-step (VERDICT r3
    item 4)."""
    from gnn_tpu.train import Config, fit

    data = stochastic_block_model(num_nodes=120, num_classes=3, seed=31)
    cfg = Config()
    cfg.model.name = "encoder_gcn"
    cfg.model.dropout = 0.0
    cfg.optim.lr = 0.01
    cfg.train.epochs = 6
    cfg.train.eval_every = 2
    _, _, hist_single = fit(cfg, data, verbose=False)

    cfg2 = Config.from_json(cfg.to_json())
    cfg2.dist.num_parts = 8
    _, _, hist_dist = fit(cfg2, data, verbose=False)

    assert len(hist_single) == len(hist_dist) > 0
    for m1, m2 in zip(hist_single, hist_dist):
        np.testing.assert_allclose(m1["loss"], m2["loss"], rtol=1e-4)
        for k in ("train_acc", "val_acc", "test_acc"):
            if k in m1:
                np.testing.assert_allclose(m1[k], m2[k], atol=1e-6)


def test_distributed_fit_rejects_stateful_models_without_mask(rng, mesh):
    """A stateful model whose __call__ can't take the validity mask would
    silently fold padding rows into its batch statistics; fit() must refuse
    loudly."""
    from gnn_tpu.models import EncoderGCN
    from gnn_tpu.train import Config, fit

    class NoMaskEncoder(nn.Module):
        inner: EncoderGCN

        def __init__(self, inner):
            self.inner = inner

        def __call__(self, x, adj, state, *, key=None):
            return self.inner(x, adj, state, key=key)

    data = stochastic_block_model(num_nodes=64, num_classes=3, seed=5)
    model = NoMaskEncoder(EncoderGCN(16, 3, key=KEY))
    cfg = Config()
    cfg.train.epochs = 1
    cfg.dist.num_parts = 8
    with pytest.raises(ValueError, match="mask"):
        fit(cfg, data, model=model, verbose=False)


@pytest.mark.parametrize("model_name", ("gat", "sage", "gin"))
def test_dist_models_transparent(rng, mesh, model_name):
    """models.GAT / GraphSAGE / GIN run unchanged on a DistGraph
    (reference MessagePassing protocol graph.h:110-120 over the mesh;
    VERDICT r3 item 2 added GIN, whose unweighted sum rides
    DistGraph.with_weight(None))."""
    from gnn_tpu.models import GAT, GIN, GraphSAGE

    data = stochastic_block_model(num_nodes=96, num_classes=3, seed=23)
    ei = np.asarray(data.edge_index)
    ei, _ = graphs.add_self_loops(ei, num_nodes=data.num_nodes)
    adj = graphs.build_adjacency(ei, num_nodes=data.num_nodes, layout="csr")
    dist = partition_graph(
        ei, None, num_nodes=data.num_nodes, mesh=mesh, halo="alltoall"
    )
    if model_name == "gat":
        model = GAT(16, 8, 3, key=KEY, heads=2, dropout=0.0)
    elif model_name == "gin":
        model = GIN(16, 8, 3, key=KEY)
    else:
        model = GraphSAGE(16, 8, 3, key=KEY, dropout=0.0)
    single = np.asarray(model(data.x, adj))
    x_sh = shard_node_array(dist, data.x, mesh)
    out = np.asarray(dist.unshard_nodes(model(x_sh, dist)))
    np.testing.assert_allclose(out, single, rtol=1e-3, atol=1e-4)


def test_dist_with_weight_none_on_weighted_partition(rng, mesh):
    """with_weight(None) on a partition built WITH baked edge weights must
    aggregate with unit weights (the dynamic unit-weight path), matching the
    single-chip unweighted SpMM — and stay differentiable in x."""
    ei, w, x, n = make_graph(rng, n=64, e=400)
    dist = partition_graph(
        ei, w, num_nodes=n, mesh=mesh, halo="alltoall"
    )
    unit = dist.with_weight(None)
    assert unit.unit_weight and dist.has_weight
    adj_unw = graphs.build_adjacency(ei, None, num_nodes=n, layout="csr")
    single = np.asarray(ops.spmm(adj_unw, x))
    x_sh = shard_node_array(dist, x, mesh)
    out = np.asarray(unit.unshard_nodes(ops.spmm(unit, x_sh)))
    np.testing.assert_allclose(out, single, rtol=1e-4, atol=1e-5)
    # grad flows through the dynamic path's gather_src_dist VJP
    g = jax.grad(lambda xs: jnp.sum(jnp.sin(ops.spmm(unit, xs))))(x_sh)
    g_single = jax.grad(lambda xv: jnp.sum(jnp.sin(ops.spmm(adj_unw, xv))))(x)
    np.testing.assert_allclose(
        np.asarray(dist.unshard_nodes(g)),
        np.asarray(g_single),
        rtol=1e-4,
        atol=1e-5,
    )
    # unweighted partitions: with_weight(None) is the identity
    dist0 = partition_graph(ei, None, num_nodes=n, mesh=mesh)
    assert dist0.with_weight(None) is dist0
    with pytest.raises(ValueError, match="only None"):
        dist0.with_weight(jnp.ones((ei.shape[1],)))


# -- data-parallel sampled minibatches ---------------------------------------


def test_dp_sampled_grads_match_serial_mean():
    """One DP step's gradients == mean of the per-shard gradients computed
    serially with the same per-shard keys (the psum falls out of shard_map's
    AD transpose)."""
    from jax.sharding import PartitionSpec as PSpec

    from gnn_tpu import nn, optim
    from gnn_tpu.graphs.generate import stochastic_block_model
    from gnn_tpu.graphs.sampling import NeighborSampler
    from gnn_tpu.models import GraphSAGE

    P_parts = 4
    b_local = 8
    data = stochastic_block_model(num_nodes=300, num_classes=3, seed=0)
    sampler = NeighborSampler(data, [4, 3])
    model = GraphSAGE(int(data.x.shape[1]), 16, 3, key=jax.random.PRNGKey(0), dropout=0.0)
    params, static = nn.partition(model)
    mesh = make_mesh((P_parts,), ("data",), devices=jax.devices()[:P_parts])
    spec = PSpec("data")
    key = jax.random.PRNGKey(7)
    keys = jax.random.split(key, P_parts)
    seeds = jnp.asarray(
        np.random.default_rng(1).integers(0, 300, P_parts * b_local), jnp.int32
    )
    x_full, y_full = data.x, data.y

    def dp_loss(p):
        m = nn.combine(p, static)

        def local(seeds_l, keys_l):
            k = keys_l[0]
            nodes, adjs = sampler.sample(k, seeds_l)
            logits = m.forward_sampled(jnp.take(x_full, nodes, axis=0), adjs)
            return nn.cross_entropy(logits, jnp.take(y_full, seeds_l))[None]

        losses = jax.shard_map(
            local, mesh=mesh, in_specs=(spec, spec), out_specs=spec,
            axis_names={"data"},
        )(seeds, keys)
        return jnp.mean(losses)

    dp_val, dp_grads = jax.jit(jax.value_and_grad(dp_loss))(params)

    def serial_loss(p):
        m = nn.combine(p, static)
        losses = []
        for i in range(P_parts):
            s = seeds[i * b_local : (i + 1) * b_local]
            nodes, adjs = sampler.sample(keys[i], s)
            logits = m.forward_sampled(jnp.take(x_full, nodes, axis=0), adjs)
            losses.append(nn.cross_entropy(logits, jnp.take(y_full, s)))
        return jnp.mean(jnp.stack(losses))

    ref_val, ref_grads = jax.jit(jax.value_and_grad(serial_loss))(params)
    assert abs(float(dp_val) - float(ref_val)) < 1e-5
    for a, b in zip(
        jax.tree_util.tree_leaves(dp_grads), jax.tree_util.tree_leaves(ref_grads)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


def test_fit_dp_sampled_learns():
    from gnn_tpu.graphs.generate import stochastic_block_model
    from gnn_tpu.train.config import Config
    from gnn_tpu.train.loop import fit

    data = stochastic_block_model(num_nodes=300, num_classes=3, seed=4)
    cfg = Config.from_dict(
        {
            "train": {
                "epochs": 40, "eval_every": 40, "batch_size": 32,
                "fanouts": [4, 3],
            },
            "dist": {"num_parts": 4},
            "model": {"name": "sage", "hidden": 16, "dropout": 0.0},
        }
    )
    _, _, hist = fit(cfg, data, verbose=False)
    assert hist[-1]["test_acc"] > 0.7


def test_fit_dp_sampled_batch_divisibility_error():
    from gnn_tpu.graphs.generate import stochastic_block_model
    from gnn_tpu.train.config import Config
    from gnn_tpu.train.loop import fit

    data = stochastic_block_model(num_nodes=100, num_classes=2, seed=5)
    cfg = Config.from_dict(
        {"train": {"epochs": 1, "batch_size": 30}, "dist": {"num_parts": 4}}
    )
    with pytest.raises(ValueError, match="divide evenly"):
        fit(cfg, data, verbose=False)


# -- tensor (model) parallelism ----------------------------------------------


def test_tensor_parallel_gcn_matches_single_chip(rng):
    """Linear out-features sharded over a 'model' axis on a 2-D
    (data x model) mesh, composed with the node-partitioned SpMM:
    logits and parameter grads must match the single-device run (GSPMD
    inserts the collectives; this pins the numerics, not just finiteness)."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as PSpec

    from gnn_tpu.models import GCN

    data = stochastic_block_model(num_nodes=96, num_classes=3, seed=21)
    ei, w = graphs.gcn_norm(
        np.asarray(data.edge_index), num_nodes=data.num_nodes
    )
    mesh2 = make_mesh((4, 2), ("data", "model"), devices=jax.devices()[:8])
    dist = partition_graph(
        ei, w, num_nodes=data.num_nodes, mesh=mesh2, halo="alltoall"
    )
    adj = graphs.build_adjacency(ei, jnp.asarray(w), num_nodes=data.num_nodes)

    model = GCN(16, 8, 3, key=KEY, dropout=0.0)
    params, static = nn.partition(model)
    y = jnp.asarray(np.asarray(data.y))

    # single-chip reference
    def ref_loss(p):
        return nn.cross_entropy(nn.combine(p, static)(data.x, adj), y)

    ref_val, ref_grads = jax.value_and_grad(ref_loss)(params)

    # TP: shard every >=2-D param's leading (out-features) dim over 'model'
    def shard_params(path, leaf):
        # out-features dim must divide the 'model' axis (the classifier head
        # with 3 classes stays replicated — the standard mixed-TP policy)
        if leaf is None or leaf.ndim < 2 or leaf.shape[0] % 2:
            return NamedSharding(mesh2, PSpec())
        return NamedSharding(mesh2, PSpec("model", None))

    shardings = jax.tree_util.tree_map_with_path(shard_params, params)
    params_tp = jax.tree_util.tree_map(
        lambda p, s: None if p is None else jax.device_put(p, s),
        params,
        shardings,
        is_leaf=lambda v: v is None,
    )
    x_sh = shard_node_array(dist, data.x, mesh2)
    y_sh = dist.shard_nodes(y)
    m_sh = dist.shard_nodes(jnp.ones((data.num_nodes,), bool), fill=False)

    @jax.jit
    def tp_loss_grad(p):
        def loss_fn(p):
            logits = nn.combine(p, static)(x_sh, dist)
            return nn.cross_entropy(logits, y_sh, m_sh)

        return jax.value_and_grad(loss_fn)(p)

    tp_val, tp_grads = tp_loss_grad(params_tp)
    assert abs(float(tp_val) - float(ref_val)) < 1e-5
    for a, b in zip(
        jax.tree_util.tree_leaves(tp_grads), jax.tree_util.tree_leaves(ref_grads)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5
        )
    # the TP params really are distributed over 'model'
    w0 = jax.tree_util.tree_leaves(tp_grads)[0]
    assert len(w0.sharding.device_set) >= 2


def test_scaling_accounting_matches_partitioner(rng):
    """benchmarks/scaling.py's exact comm accounting must agree with what
    the real partitioner plans to ship (the padded pair size h_max)."""
    from benchmarks.scaling import partition_comm

    ei, w, x, n = make_graph(rng, n=96, e=500)
    ei, _ = graphs.to_undirected(ei, num_nodes=n)  # symmetric: fwd == bwd
    ei, w = graphs.gcn_norm(ei, num_nodes=n)
    P_ = 4
    dist = partition_graph(ei, w, num_nodes=n, num_parts=P_, halo="alltoall")
    src = np.asarray(ei[0], np.int64)
    dst = np.asarray(ei[1], np.int64)
    acc = partition_comm(src, dst, n, P_)
    assert acc["n_max"] == dist.n_max
    assert acc["h_max"] == dist.h_max


def test_multihost_two_process_smoke():
    """Execute parallel.multihost for real: two coordinated CPU processes
    (2 virtual devices each), a mesh spanning BOTH, one spmm_dist step
    checked against the dense oracle on every process's addressable output
    shards (tests/multihost_worker.py). The DCN path VERDICT r4 flagged as
    never executed."""
    import os
    import socket
    import subprocess
    import sys

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    coord = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(worker))
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    # workers force their own cpu platform + 2-device XLA_FLAGS; drop the
    # parent suite's 8-device setting so it doesn't override theirs
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), coord],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=200)[0] for p in procs]
    for i, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{o[-3000:]}"
        assert f"MULTIHOST_OK pid={i} shards=2" in o, o[-3000:]
