"""Neighbor sampling tests (BASELINE config #3: minibatch GraphSAGE)."""

import jax
import jax.numpy as jnp
import numpy as np

from gnn_tpu import graphs, nn, optim
from gnn_tpu.graphs.generate import stochastic_block_model
from gnn_tpu.graphs.sampling import NeighborSampler, sample_neighbors
from gnn_tpu.models import GraphSAGE

KEY = jax.random.PRNGKey(3)


def test_sample_neighbors_respects_adjacency(rng):
    ei = graphs.edge_list([1, 2, 3, 4], [0, 0, 1, 1])
    sampler = NeighborSampler(np.asarray(ei), fanouts=[4], num_nodes=5)
    nbrs = np.asarray(
        sample_neighbors(KEY, sampler.row_ptr, sampler.col, jnp.array([0, 1]), 4)
    )
    assert set(nbrs[0]) <= {1, 2}  # in-neighbors of 0
    assert set(nbrs[1]) <= {3, 4}


def test_zero_degree_seeds_self_sample():
    ei = graphs.edge_list([1], [0])
    sampler = NeighborSampler(np.asarray(ei), fanouts=[3], num_nodes=4)
    nbrs = np.asarray(
        sample_neighbors(KEY, sampler.row_ptr, sampler.col, jnp.array([2, 3]), 3)
    )
    np.testing.assert_array_equal(nbrs[0], 2)
    np.testing.assert_array_equal(nbrs[1], 3)


def test_sampled_forward_matches_full_when_deterministic(rng):
    """Every node has exactly one in-neighbor -> sampling is deterministic
    and the sampled forward must equal the full-graph forward exactly."""
    n = 10
    src = (np.arange(n) + 1) % n
    dst = np.arange(n)
    ei = np.stack([src, dst])
    x = rng.normal(size=(n, 6)).astype(np.float32)
    model = GraphSAGE(6, 8, 3, key=KEY, num_layers=2, dropout=0.0)

    adj = graphs.build_adjacency(ei, num_nodes=n, layout="csr")
    full = np.asarray(model(jnp.asarray(x), adj))

    sampler = NeighborSampler(ei, fanouts=[4, 4], num_nodes=n)
    seeds = jnp.arange(n, dtype=jnp.int32)
    nodes, adjs = sampler.sample(KEY, seeds)
    out = model.forward_sampled(jnp.asarray(x)[nodes], adjs)
    np.testing.assert_allclose(np.asarray(out), full, rtol=1e-4, atol=1e-5)


def test_sampler_static_structure():
    """Adjacency structure is batch-independent (cached constants)."""
    ei = graphs.edge_list([0, 1, 2], [1, 2, 0])
    s = NeighborSampler(np.asarray(ei), fanouts=[2, 3], num_nodes=3)
    a1 = s.adjacencies(4)
    a2 = s.adjacencies(4)
    assert a1[0] is a2[0]
    assert a1[0].num_dst_nodes == 4 * (1 + 2)
    assert a1[1].num_dst_nodes == 4


def test_sample_inside_jit(rng):
    data = stochastic_block_model(num_nodes=80, num_classes=2, seed=21)
    sampler = NeighborSampler(data, fanouts=[3, 3])
    model = GraphSAGE(16, 8, 2, key=KEY, dropout=0.0)

    @jax.jit
    def fwd(key, seeds, x):
        nodes, adjs = sampler.sample(key, seeds)
        return model.forward_sampled(x[nodes], adjs)

    out = fwd(KEY, jnp.arange(16, dtype=jnp.int32), data.x)
    assert out.shape == (16, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_minibatch_sage_learns_sbm():
    """End-to-end minibatch training reaches full-graph-level accuracy."""
    data = stochastic_block_model(num_nodes=300, num_classes=3, seed=22)
    sampler = NeighborSampler(data, fanouts=[5, 5])
    model = GraphSAGE(16, 32, 3, key=KEY, dropout=0.0)
    params, static = nn.partition(model)
    opt = optim.adam(1e-2)
    opt_state = opt.init(params)
    batch = 64

    train_ids = np.nonzero(np.asarray(data.train_mask))[0]

    @jax.jit
    def step(params, opt_state, key, seeds):
        def loss_fn(p):
            m = nn.combine(p, static)
            nodes, adjs = sampler.sample(key, seeds)
            logits = m.forward_sampled(data.x[nodes], adjs)
            return nn.cross_entropy(logits, data.y[seeds])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(grads, opt_state, params)
        return optim.apply_updates(params, upd), opt_state, loss

    key = KEY
    rng_np = np.random.default_rng(0)
    for i in range(120):
        key, k1 = jax.random.split(key)
        seeds = jnp.asarray(rng_np.choice(train_ids, batch), jnp.int32)
        params, opt_state, loss = step(params, opt_state, k1, seeds)

    # full-graph inference with the trained params
    adj = graphs.build_adjacency(
        np.asarray(data.edge_index), num_nodes=data.num_nodes, layout="csr"
    )
    model = nn.inference_mode(nn.combine(params, static))
    logits = model(data.x, adj)
    acc = float(nn.accuracy(logits, data.y, data.test_mask))
    assert acc > 0.8, f"minibatch SAGE accuracy {acc}"
