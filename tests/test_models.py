"""End-to-end model tests: the training-step capability the reference only
has as disconnected parts (SURVEY.md §3.3) must actually learn here."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_tpu import graphs, nn, optim
from gnn_tpu.graphs.generate import karate_club, stochastic_block_model
from gnn_tpu.models import GCN, GAT, EncoderGCN, GraphSAGE

KEY = jax.random.PRNGKey(0)


def train_full_graph(model_fn, data, steps=60, lr=1e-2, needs_state=False, **call_kw):
    adj = data.to_adjacency(norm="sym")
    model = model_fn()
    state = nn.init_state(model) if needs_state else None
    params, static = nn.partition(model)
    opt = optim.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, state, key):
        def loss_fn(p):
            m = nn.combine(p, static)
            if needs_state:
                logits, new_state = m(data.x, adj, state, key=key)
            else:
                logits, new_state = m(data.x, adj, key=key), None
            loss = nn.cross_entropy(logits, data.y, data.train_mask)
            return loss, new_state

        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optim.apply_updates(params, updates)
        return params, opt_state, new_state, loss

    key = KEY
    for _ in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, new_state, loss = step(params, opt_state, state, sub)
        if needs_state:
            state = new_state

    final = nn.inference_mode(nn.combine(params, static))
    if needs_state:
        logits, _ = final(data.x, adj, state)
    else:
        logits = final(data.x, adj)
    return float(nn.accuracy(logits, data.y, data.test_mask)), float(loss)


def test_gcn_learns_sbm():
    data = stochastic_block_model(num_nodes=200, num_classes=4, seed=1)
    acc, loss = train_full_graph(
        lambda: GCN(16, 32, 4, key=KEY, dropout=0.2), data, steps=80
    )
    assert loss < 0.5
    assert acc > 0.85, f"GCN test accuracy {acc}"


def test_sage_learns_sbm():
    data = stochastic_block_model(num_nodes=200, num_classes=4, seed=2)
    acc, _ = train_full_graph(
        lambda: GraphSAGE(16, 32, 4, key=KEY, dropout=0.2), data, steps=80
    )
    assert acc > 0.85, f"SAGE test accuracy {acc}"


def test_gat_learns_sbm():
    data = stochastic_block_model(num_nodes=150, num_classes=3, seed=3)
    acc, _ = train_full_graph(
        lambda: GAT(16, 8, 3, key=KEY, heads=4, dropout=0.2), data, steps=100, lr=5e-3
    )
    assert acc > 0.8, f"GAT test accuracy {acc}"


def test_encoder_gcn_reference_recipe_learns():
    """The reference flagship (pre-MLP -> GCNConv+tanh stack -> post-MLP,
    src/main.cpp:10-30) with BN mid-blocks and state threading."""
    data = stochastic_block_model(num_nodes=200, num_classes=4, seed=4)
    acc, _ = train_full_graph(
        lambda: EncoderGCN(16, 4, key=KEY, num_layers=2),
        data,
        steps=80,
        needs_state=True,
    )
    assert acc > 0.8, f"EncoderGCN test accuracy {acc}"


def test_gcn_bf16_mixed_precision_learns():
    """The TPU mixed-precision recipe: bf16 activations (layers follow the
    input dtype; the MXU's native format), f32 master params + f32 loss
    (nn.cross_entropy upcasts internally). Grads come back f32 through the
    cast's VJP, so the optimizer state stays full-precision."""
    data = stochastic_block_model(num_nodes=200, num_classes=4, seed=7)
    adj = data.to_adjacency(norm="sym")
    x16 = data.x.astype(jnp.bfloat16)
    model = GCN(16, 16, 4, key=KEY, dropout=0.0)
    params, static = nn.partition(model)
    opt = optim.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = nn.combine(p, static)(x16, adj)
            assert logits.dtype == jnp.bfloat16
            return nn.cross_entropy(logits, data.y, data.train_mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optim.apply_updates(params, updates), opt_state, loss

    for _ in range(80):
        params, opt_state, loss = step(params, opt_state)
    assert loss.dtype == jnp.float32  # loss math upcasts
    w = params.convs[0].lin.weight
    assert w.dtype == jnp.float32  # master params stay f32
    logits = nn.inference_mode(nn.combine(params, static))(x16, adj)
    acc = float(nn.accuracy(logits, data.y, data.test_mask))
    assert acc > 0.8, f"bf16 GCN accuracy {acc}"


def test_karate_club_overfit():
    """Tiny sanity: 2-layer GCN separates the two factions."""
    data = karate_club()
    mask = np.zeros(34, bool)
    mask[[0, 33, 1, 32]] = True  # 4 labeled nodes
    data = data.replace(
        train_mask=jnp.asarray(mask), test_mask=jnp.asarray(~mask)
    )
    acc, _ = train_full_graph(
        lambda: GCN(34, 16, 2, key=KEY, dropout=0.0), data, steps=100
    )
    assert acc > 0.85, f"karate accuracy {acc}"


def test_train_step_deterministic():
    """Same seed -> identical params after a step (functional PRNG)."""
    data = stochastic_block_model(num_nodes=50, num_classes=2, seed=5)
    adj = data.to_adjacency(norm="sym")

    def one(seed):
        model = GCN(16, 8, 2, key=jax.random.PRNGKey(3), dropout=0.5)
        params, static = nn.partition(model)
        g = jax.grad(
            lambda p: nn.cross_entropy(
                nn.combine(p, static)(data.x, adj, key=jax.random.PRNGKey(seed)),
                data.y,
                data.train_mask,
            )
        )(params)
        return g

    g1, g2 = one(7), one(7)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gin_graph_level_readout():
    """Graph classification over a Batch (sum readout per graph)."""
    from gnn_tpu.models import GIN

    g1 = stochastic_block_model(num_nodes=20, num_classes=2, seed=31)
    g2 = stochastic_block_model(num_nodes=25, num_classes=2, seed=32)
    batch = graphs.Batch([g1, g2])
    adj = batch.to_adjacency(norm=None, add_self_loops=False)
    model = GIN(16, 8, 3, key=KEY)
    out = model(batch.x, adj, graph_id=batch.graph_id, num_graphs=2)
    assert out.shape == (2, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_cora_like_statistics():
    """The committed Cora stand-in matches the published statistics
    (docs/PARITY.md): exact N/E/classes/splits, degree & homophily bands."""
    from gnn_tpu.graphs.generate import cora_like

    d = cora_like(seed=0)
    ei, y = np.asarray(d.edge_index), np.asarray(d.y)
    assert d.num_nodes == 2708 and ei.shape[1] == 2 * 5278
    assert list(np.bincount(y)) == [351, 217, 418, 818, 426, 298, 180]
    assert d.x.shape == (2708, 1433)
    deg = np.bincount(ei[1], minlength=2708)
    assert 3.7 < deg.mean() < 4.1
    homophily = (y[ei[0]] == y[ei[1]]).mean()
    assert 0.75 < homophily < 0.85
    assert int(d.train_mask.sum()) == 140
    assert int(d.val_mask.sum()) == 500
    assert int(d.test_mask.sum()) == 1000
    # 20 train nodes per class (canonical Planetoid protocol)
    assert all(int(m) == 20 for m in np.bincount(y[np.asarray(d.train_mask)]))


@pytest.mark.slow
def test_cora_like_gcn_accuracy_band():
    """Kipf-recipe 2-layer GCN lands in the Cora accuracy band on the
    stand-in (real-data parity is blocked on data: docs/PARITY.md)."""
    from gnn_tpu.graphs.generate import cora_like
    from gnn_tpu.train import Config, fit

    cfg = Config()
    cfg.model.name = "gcn"
    cfg.model.hidden = 16
    cfg.model.dropout = 0.5
    cfg.optim.lr = 0.01
    cfg.optim.weight_decay = 5e-4
    cfg.train.epochs = 200
    cfg.train.eval_every = 200
    _, _, hist = fit(cfg, cora_like(seed=0), verbose=False)
    acc = hist[-1]["test_acc"]
    assert 0.78 <= acc <= 0.88, f"outside Cora band: {acc}"


@pytest.mark.slow
def test_cora_like_gcn_accuracy_band_cluster_layout():
    """Same Kipf recipe through the cluster-packed blocked SpMM layout
    (reorder='cluster') — the layout swap must not move accuracy."""
    from gnn_tpu.graphs.generate import cora_like
    from gnn_tpu.train import Config, fit

    cfg = Config()
    cfg.model.name = "gcn"
    cfg.model.hidden = 16
    cfg.model.dropout = 0.5
    cfg.optim.lr = 0.01
    cfg.optim.weight_decay = 5e-4
    cfg.train.epochs = 200
    cfg.train.eval_every = 200
    cfg.train.reorder = "cluster"
    _, _, hist = fit(cfg, cora_like(seed=0), verbose=False)
    acc = hist[-1]["test_acc"]
    assert 0.78 <= acc <= 0.88, f"outside Cora band: {acc}"
