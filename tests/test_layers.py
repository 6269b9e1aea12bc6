"""Layer tests (reference: tests/nn.test.cpp + SURVEY.md §2.8 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_tpu import nn


KEY = jax.random.PRNGKey(42)


def test_linear_forward_analytic():
    lin = nn.Linear(3, 2, key=KEY)
    x = jnp.array([[1.0, 2.0, 3.0]])
    expected = np.asarray(x) @ np.asarray(lin.weight).T + np.asarray(lin.bias)
    np.testing.assert_allclose(lin(x), expected, rtol=1e-6)


def test_linear_init_bounds():
    # Kaiming-uniform +-1/sqrt(in) (reference src/nn.cpp:198-204)
    lin = nn.Linear(100, 50, key=KEY)
    bound = 1.0 / np.sqrt(100)
    w = np.asarray(lin.weight)
    assert w.min() >= -bound and w.max() <= bound
    assert w.std() > bound / 4  # actually spread out


def test_linear_no_bias():
    lin = nn.Linear(3, 2, key=KEY, use_bias=False)
    assert lin.bias is None
    assert lin(jnp.zeros((1, 3))).tolist() == [[0.0, 0.0]]


def test_layernorm():
    ln = nn.LayerNorm(4)
    x = jnp.array([[1.0, 2.0, 3.0, 4.0], [2.0, 2.0, 2.0, 2.0]])
    y = np.asarray(ln(x))
    np.testing.assert_allclose(y.mean(-1), 0.0, atol=1e-6)
    np.testing.assert_allclose(y[0].std(), 1.0, atol=1e-2)
    np.testing.assert_allclose(y[1], 0.0, atol=1e-3)  # constant row -> 0


def test_batchnorm_train_eval_split():
    bn = nn.BatchNorm(2, momentum=0.5)
    st = nn.init_state(bn)
    x = jnp.array([[1.0, 10.0], [3.0, 30.0]])
    y, st = bn(x, st)
    np.testing.assert_allclose(np.asarray(y).mean(0), 0.0, atol=1e-5)
    mean, var = st.get(bn.stats)
    # PyTorch convention: running = 0.5*old + 0.5*new (unbiased var)
    np.testing.assert_allclose(mean, [1.0, 10.0], atol=1e-5)
    np.testing.assert_allclose(var, 0.5 * 1.0 + 0.5 * np.array([2.0, 200.0]), rtol=1e-5)


def test_batchnorm_masked_stats_match_unpadded():
    """Masked BatchNorm over [real | padding] rows == unmasked BatchNorm
    over the real rows alone: outputs on real rows, and the running-stat
    update, are identical (the property that lets BatchNorm models train on
    the padded distributed layout)."""
    rng = np.random.default_rng(0)
    x_real = jnp.asarray(rng.normal(size=(12, 4)).astype(np.float32))
    pad = jnp.full((4, 4), 7.5)  # garbage that would skew unmasked stats
    x_pad = jnp.concatenate([x_real, pad], axis=0)
    mask = jnp.concatenate([jnp.ones(12, bool), jnp.zeros(4, bool)])

    bn = nn.BatchNorm(4, momentum=0.3)
    y_ref, st_ref = bn(x_real, nn.init_state(bn))
    y_mask, st_mask = bn(x_pad, nn.init_state(bn), mask=mask)
    np.testing.assert_allclose(
        np.asarray(y_mask)[:12], np.asarray(y_ref), rtol=1e-5, atol=1e-6
    )
    for a, b in zip(st_ref.get(bn.stats), st_mask.get(bn.stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
    with pytest.raises(ValueError, match="mask shape"):
        bn(x_pad, nn.init_state(bn), mask=mask[:3])


def test_dropout_train_and_scale():
    d = nn.Dropout(rate=0.5)
    x = jnp.ones((1000,))
    y = np.asarray(d(x, key=KEY))
    kept = y[y > 0]
    np.testing.assert_allclose(kept, 2.0)  # inverted scaling 1/(1-p)
    assert 0.3 < (len(kept) / 1000) < 0.7
    # inference = identity
    np.testing.assert_allclose(nn.inference_mode(d)(x), x)
    with pytest.raises(ValueError):
        d(x)  # no key in training mode


def test_softmax_logsoftmax():
    x = jnp.array([[1.0, 2.0, 3.0]])
    s = np.asarray(nn.softmax(x))
    np.testing.assert_allclose(s.sum(-1), 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(nn.log_softmax(x)), np.log(s), rtol=1e-5)
    # large-value stability (the reference's motivation for the max trick)
    big = jnp.array([[1000.0, 1000.0]])
    assert np.isfinite(np.asarray(nn.softmax(big))).all()


def test_sigmoid_correctness():
    # The reference's sigmoid computes 1/(1-e^x) — wrong (SURVEY.md §2.11).
    x = jnp.array([0.0, 1.0, -1.0])
    np.testing.assert_allclose(
        nn.sigmoid(x), 1.0 / (1.0 + np.exp(-np.asarray(x))), rtol=1e-6
    )


def test_relu_gradient_masking():
    x = jnp.array([-2.0, 3.0])
    g = jax.grad(lambda x: jnp.sum(nn.relu(x)))(x)
    np.testing.assert_allclose(g, [0.0, 1.0])


def test_mlp_shapes_and_depth():
    mlp = nn.MLP(4, [8, 8, 2], key=KEY, dropout=0.1)
    y = mlp(jnp.ones((5, 4)), key=KEY)
    assert y.shape == (5, 2)
    # blocks: (Linear, LN, ReLU, Dropout) x2 + final Linear = 9
    assert len(mlp.blocks) == 9


def test_sequential_fold():
    seq = nn.Sequential([nn.Linear(3, 5, key=KEY), nn.ReLU(), nn.Linear(5, 2, key=KEY)])
    x = jnp.ones((1, 3))
    manual = seq.layers[2](nn.relu(seq.layers[0](x)))
    np.testing.assert_allclose(seq(x), manual)
    assert len(seq) == 3 and isinstance(seq[1], nn.ReLU)


def test_embedding_gather_and_grad():
    emb = nn.Embedding(10, 4, key=KEY)
    idx = jnp.array([1, 1, 3])
    out = emb(idx)
    assert out.shape == (3, 4)
    np.testing.assert_allclose(out[0], out[1])
    g = jax.grad(lambda m: jnp.sum(m(idx)))(emb)
    np.testing.assert_allclose(np.asarray(g.weight)[1], 2.0)  # scatter-add
    np.testing.assert_allclose(np.asarray(g.weight)[0], 0.0)


def test_cross_entropy_matches_manual():
    # reference cross_entropy_loss semantics (src/nn.cpp:442-453)
    logits = jnp.array([[2.0, 1.0, 0.1], [0.5, 2.5, 0.3]])
    targets = jnp.array([0, 1])
    got = float(nn.cross_entropy(logits, targets))
    l = np.asarray(logits)
    probs = np.exp(l) / np.exp(l).sum(-1, keepdims=True)
    want = -np.mean(np.log(probs[np.arange(2), np.asarray(targets)]))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_cross_entropy_masked():
    logits = jnp.array([[10.0, 0.0], [0.0, 10.0], [5.0, 5.0]])
    targets = jnp.array([0, 1, 0])
    mask = jnp.array([True, True, False])
    got = float(nn.cross_entropy(logits, targets, mask))
    assert got < 1e-3  # masked-out ambiguous row ignored


def test_nll_matches_cross_entropy():
    logits = jnp.array([[2.0, 1.0], [0.3, 0.7]])
    targets = jnp.array([0, 1])
    np.testing.assert_allclose(
        nn.nll_loss(jax.nn.log_softmax(logits), targets),
        nn.cross_entropy(logits, targets),
        rtol=1e-6,
    )


def test_bce_and_mse():
    logits = jnp.array([0.0, 100.0, -100.0])
    targets = jnp.array([0.5, 1.0, 0.0])
    np.testing.assert_allclose(
        float(nn.binary_cross_entropy_with_logits(logits, targets)),
        np.log(2.0) / 3,
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        nn.mse_loss(jnp.array([1.0, 2.0]), jnp.array([0.0, 0.0])), 2.5
    )


def test_accuracy():
    logits = jnp.array([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]])
    targets = jnp.array([0, 1, 1])
    np.testing.assert_allclose(nn.accuracy(logits, targets), 2 / 3)
    np.testing.assert_allclose(
        nn.accuracy(logits, targets, jnp.array([True, True, False])), 1.0
    )
