"""Optimizer tests: correct versions of the reference's intended update rules
(SURVEY.md §2.8 documents the reference's SGD/Adam bugs; we verify against
the PyTorch-semantics formulas the reference meant to implement)."""

import jax.numpy as jnp
import numpy as np

from gnn_tpu import optim


def _run(opt, p0, grads_seq, with_params=True):
    p = {"w": jnp.asarray(p0)}
    st = opt.init(p)
    for g in grads_seq:
        upd, st = opt.update({"w": jnp.asarray(g)}, st, p if with_params else None)
        p = optim.apply_updates(p, upd)
    return np.asarray(p["w"])


def test_sgd_plain():
    p = _run(optim.sgd(0.1), [1.0], [[0.5], [0.5]])
    np.testing.assert_allclose(p, 1.0 - 0.1 * 0.5 * 2, rtol=1e-6)


def test_sgd_momentum_matches_torch_semantics():
    lr, mu = 0.1, 0.9
    g = 1.0
    # torch: v1 = g; p1 = p0 - lr*v1 ; v2 = mu*v1 + g; p2 = p1 - lr*v2
    p = _run(optim.sgd(lr, momentum=mu), [0.0], [[g], [g]])
    v1 = g
    v2 = mu * v1 + g
    np.testing.assert_allclose(p, -lr * (v1 + v2), rtol=1e-6)


def test_sgd_nesterov():
    lr, mu = 0.1, 0.9
    p = _run(optim.sgd(lr, momentum=mu, nesterov=True), [0.0], [[1.0]])
    # d = g + mu*v, v = g -> d = 1 + 0.9
    np.testing.assert_allclose(p, -lr * 1.9, rtol=1e-6)


def test_sgd_weight_decay():
    p = _run(optim.sgd(0.1, weight_decay=0.5), [2.0], [[0.0]])
    np.testing.assert_allclose(p, 2.0 - 0.1 * (0.5 * 2.0), rtol=1e-6)


def test_sgd_dampening():
    lr, mu, tau = 0.1, 0.9, 0.5
    p = _run(optim.sgd(lr, momentum=mu, dampening=tau), [0.0], [[1.0], [1.0]])
    v1 = (1 - tau) * 1.0
    v2 = mu * v1 + (1 - tau) * 1.0
    np.testing.assert_allclose(p, -lr * (v1 + v2), rtol=1e-6)


def test_adam_first_step_is_lr_sized():
    # bias correction makes step ~= lr * sign(g) on step 1
    p = _run(optim.adam(1e-3), [1.0], [[0.37]])
    np.testing.assert_allclose(p, 1.0 - 1e-3, rtol=1e-4)


def test_adam_matches_manual_two_steps():
    lr, b1, b2, eps = 0.01, 0.9, 0.999, 1e-8
    gs = [0.3, -0.2]
    m = v = 0.0
    pw = 1.0
    for t, g in enumerate(gs, start=1):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh, vh = m / (1 - b1**t), v / (1 - b2**t)
        pw -= lr * mh / (np.sqrt(vh) + eps)
    p = _run(optim.adam(lr, b1=b1, b2=b2, eps=eps), [1.0], [[g] for g in gs])
    np.testing.assert_allclose(p, pw, rtol=1e-6)


def test_adamw_decoupled_decay():
    lr, wd = 0.1, 0.5
    p_w = _run(optim.adamw(lr, weight_decay=wd), [1.0], [[0.0]])
    # zero grad => no adam step, only decay: p - lr*wd*p
    np.testing.assert_allclose(p_w, 1.0 - lr * wd * 1.0, rtol=1e-6)


def test_chain_and_clip():
    opt = optim.chain(optim.clip_by_global_norm(1.0), optim.sgd(1.0))
    p = _run(opt, [0.0], [[3.0, 4.0]])  # norm 5 -> scaled to 1
    np.testing.assert_allclose(p, [-0.6, -0.8], rtol=1e-5)


def test_none_leaves_pass_through():
    opt = optim.adam(1e-2)
    p = {"w": jnp.ones(2), "frozen": None}
    st = opt.init(p)
    upd, st = opt.update({"w": jnp.ones(2), "frozen": None}, st, p)
    p2 = optim.apply_updates(p, upd)
    assert p2["frozen"] is None and p2["w"].shape == (2,)


def test_optax_interop():
    """Our GradientTransformation protocol matches optax's."""
    import optax

    p = {"w": jnp.ones(3)}
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-2))
    st = opt.init(p)
    upd, st = opt.update({"w": jnp.ones(3)}, st, p)
    p2 = optax.apply_updates(p, upd)
    assert p2["w"].shape == (3,)
