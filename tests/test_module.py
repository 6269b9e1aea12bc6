"""Module system tests (reference: tests/nn.test.cpp module registry tests,
src/nn.cpp:87-146 naming semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_tpu import nn


class Child(nn.Module):
    w: jax.Array
    name: str = nn.static_field(default="child")

    def __call__(self, x):
        return x @ self.w


class Parent(nn.Module):
    a: Child
    b: Child
    scale: float = nn.static_field(default=1.0)

    def __call__(self, x):
        return self.scale * self.b(self.a(x))


def make_parent():
    return Parent(
        a=Child(w=jnp.ones((3, 4))), b=Child(w=jnp.full((4, 2), 2.0)), scale=0.5
    )


def test_pytree_round_trip():
    p = make_parent()
    leaves, treedef = jax.tree_util.tree_flatten(p)
    assert len(leaves) == 2
    p2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(p2, Parent) and p2.scale == 0.5


def test_named_parameters_qualified():
    p = make_parent()
    names = [k for k, _ in nn.named_parameters(p)]
    assert names == ["a.w", "b.w"]
    assert nn.parameter_count(p) == 12 + 8


def test_partition_combine_identity():
    p = make_parent()
    params, static = nn.partition(p)
    q = nn.combine(params, static)
    x = jnp.ones((1, 3))
    np.testing.assert_allclose(p(x), q(x))


def test_grad_only_trainable():
    p = make_parent()
    params, static = nn.partition(p)
    g = jax.grad(lambda pp: jnp.sum(nn.combine(pp, static)(jnp.ones((1, 3)))))(params)
    assert g.a.w.shape == (3, 4)
    assert g.b.w.shape == (4, 2)


def test_int_leaves_not_trainable():
    class WithInt(nn.Module):
        w: jax.Array
        idx: jax.Array

    m = WithInt(w=jnp.ones(3), idx=jnp.arange(3))
    params, static = nn.partition(m)
    leaves = jax.tree_util.tree_leaves(params)
    assert len(leaves) == 1  # int array excluded from trainables


def test_state_dict_round_trip():
    p = make_parent()
    sd = nn.state_dict(p)
    assert set(sd) == {"a.w", "b.w"}
    p2 = nn.load_state_dict(p, {k: v + 1 for k, v in sd.items()})
    np.testing.assert_allclose(p2.a.w, np.asarray(p.a.w) + 1)
    with pytest.raises(KeyError):
        nn.load_state_dict(p, {"a.w": sd["a.w"]})
    with pytest.raises(ValueError):
        nn.load_state_dict(p, {"a.w": jnp.ones((1,)), "b.w": sd["b.w"]})


def test_replace_with_custom_init():
    lin = nn.Linear(3, 4, key=jax.random.PRNGKey(0))
    lin2 = lin.replace(bias=None)
    assert lin2.bias is None and lin2.weight is lin.weight
    with pytest.raises(TypeError):
        lin.replace(nonexistent=1)


def test_inference_mode_recursive():
    key = jax.random.PRNGKey(0)
    m = nn.Sequential(
        [nn.Linear(3, 3, key=key), nn.Dropout(rate=0.5), nn.Dropout(rate=0.2)]
    )
    mi = nn.inference_mode(m)
    assert all(
        l.inference for l in mi.layers if isinstance(l, nn.Dropout)
    )
    # inference dropout needs no key and is identity
    x = jnp.ones((2, 3))
    np.testing.assert_allclose(mi.layers[1](x), x)
    back = nn.inference_mode(mi, False)
    assert not back.layers[1].inference


def test_jit_module_as_argument():
    p = make_parent()

    @jax.jit
    def f(m, x):
        return m(x)

    x = jnp.ones((2, 3))
    np.testing.assert_allclose(f(p, x), p(x))


def test_tree_at():
    p = make_parent()
    p2 = nn.tree_at(lambda m: m.a.w, p, jnp.zeros((3, 4)))
    assert float(jnp.sum(jnp.abs(p2.a.w))) == 0
    np.testing.assert_allclose(p2.b.w, p.b.w)


def test_state_store():
    bn = nn.BatchNorm(4)
    st = nn.init_state(bn)
    x = jnp.arange(12.0).reshape(3, 4)
    y, st2 = bn(x, st)
    # training mode normalizes with batch stats
    np.testing.assert_allclose(np.mean(np.asarray(y), axis=0), 0.0, atol=1e-5)
    mean, var = st2.get(bn.stats)
    np.testing.assert_allclose(mean, 0.1 * np.mean(np.asarray(x), 0), atol=1e-5)
    # inference mode uses running stats -> different result than train
    y_inf, _ = nn.inference_mode(bn)(x, st2)
    assert not np.allclose(y, y_inf)


def test_make_with_state_strips_init():
    bn, st = nn.make_with_state(nn.BatchNorm)(4)
    assert bn.stats.init is None
    assert st.get(bn.stats) is not None
    # buffers live in state, not in trainable partition
    params, _ = nn.partition(bn)
    names = [k for k, _ in nn.named_parameters(params) ]
    assert set(names) == {"weight", "bias"}
