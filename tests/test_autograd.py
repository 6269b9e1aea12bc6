"""Analytic-gradient op tests.

Parity with the reference's test strategy (tests/operation.test.cpp:32-234;
SURVEY.md §4): for each op the reference implements as a hand-written
Operation (include/operation.h:103-616), verify that jax.grad reproduces the
analytic derivative. This pins down that jax.grad covers the reference's
entire autograd surface (SURVEY.md §3.2: the tape is replaced wholesale).
"""

import jax
import jax.numpy as jnp
import numpy as np

from gnn_tpu.ops import segment_sum


def check_grad(f, x, expected):
    np.testing.assert_allclose(jax.grad(f)(x), expected, rtol=1e-5, atol=1e-6)


def test_add_grad():  # reference Add, operation.h:103-129
    x = jnp.array([1.0, 2.0, 3.0])
    check_grad(lambda x: jnp.sum(x + 5.0), x, np.ones(3))


def test_add_broadcast_unbroadcast_grad():
    # sum_to_size un-broadcast (operation.h:124)
    a = jnp.ones((2, 3))
    b = jnp.ones((3,))
    g = jax.grad(lambda b: jnp.sum(a + b))(b)
    np.testing.assert_allclose(g, 2.0 * np.ones(3))


def test_mul_grad():  # Mul, operation.h:131-168
    x = jnp.array([1.0, 2.0, 3.0])
    y = jnp.array([4.0, 5.0, 6.0])
    check_grad(lambda x: jnp.sum(x * y), x, np.asarray(y))


def test_div_grad():  # Div, operation.h:169-208
    x = jnp.array([1.0, 2.0, 4.0])
    y = jnp.array([2.0, 4.0, 8.0])
    check_grad(lambda x: jnp.sum(x / y), x, 1.0 / np.asarray(y))
    check_grad(lambda y: jnp.sum(x / y), y, -np.asarray(x) / np.asarray(y) ** 2)


def test_pow_grad():  # Pow, operation.h:210-253 (both base and exponent)
    x = jnp.array([1.0, 2.0, 3.0])
    n = 3.0
    check_grad(lambda x: jnp.sum(x**n), x, n * np.asarray(x) ** (n - 1))
    e = jnp.array([2.0])
    check_grad(
        lambda e: jnp.sum(2.0**e), e, np.log(2.0) * 2.0 ** np.asarray(e)
    )


def test_sum_grad():  # Sum, operation.h:255-292 (unsqueeze+expand backward)
    x = jnp.arange(6.0).reshape(2, 3)
    g = jax.grad(lambda x: jnp.sum(jnp.sum(x, axis=1) ** 2))(x)
    expected = (2 * np.asarray(x).sum(1, keepdims=True)) * np.ones((2, 3))
    np.testing.assert_allclose(g, expected)


def test_mean_grad():  # Mean, operation.h:294-336
    x = jnp.arange(6.0).reshape(2, 3)
    check_grad(lambda x: jnp.sum(jnp.mean(x, axis=1)), x, np.full((2, 3), 1 / 3))


def test_exp_log_grad():  # Exp/Log, operation.h:338-396
    x = jnp.array([0.5, 1.0, 1.5])
    check_grad(lambda x: jnp.sum(jnp.exp(x)), x, np.exp(np.asarray(x)))
    check_grad(lambda x: jnp.sum(jnp.log(x)), x, 1.0 / np.asarray(x))


def test_transpose_grad():  # Transpose, operation.h:398-434
    x = jnp.arange(6.0).reshape(2, 3)
    w = jnp.arange(6.0).reshape(3, 2)
    g = jax.grad(lambda x: jnp.sum(x.T * w))(x)
    np.testing.assert_allclose(g, np.asarray(w).T)


def test_var_grad():
    # Var, operation.h:436-487: d/dx var(x) = 2(x - mean)/(n - correction).
    # The reference validates its backward against hard-coded torch values
    # (tests/operation.test.cpp:181-217); we check the analytic formula.
    x = jnp.array([1.0, 2.0, 4.0, 7.0])
    n = 4
    for ddof in (0, 1):
        g = jax.grad(lambda x: jnp.var(x, ddof=ddof))(x)
        expected = 2 * (np.asarray(x) - np.mean(np.asarray(x))) / (n - ddof)
        np.testing.assert_allclose(g, expected, rtol=1e-6)


def test_matmul_grad():  # MatMul, operation.h:489-535: dA = G B^T, dB = A^T G
    A = jnp.arange(6.0).reshape(2, 3)
    B = jnp.arange(12.0).reshape(3, 4)
    G = jnp.ones((2, 4))
    gA = jax.grad(lambda A: jnp.sum(A @ B))(A)
    gB = jax.grad(lambda B: jnp.sum(A @ B))(B)
    np.testing.assert_allclose(gA, np.asarray(G) @ np.asarray(B).T)
    np.testing.assert_allclose(gB, np.asarray(A).T @ np.asarray(G))


def test_batched_matmul_broadcast_grad():
    # batched with broadcast over leading dims (functional.h:399-441)
    A = jnp.ones((5, 2, 3))
    B = jnp.ones((3, 4))
    gB = jax.grad(lambda B: jnp.sum(A @ B))(B)
    np.testing.assert_allclose(gB, 5 * 2 * np.ones((3, 4)))


def test_where_grad():  # Mask, operation.h:537-573: grad routed by condition
    x = jnp.array([-1.0, 2.0, -3.0])
    g = jax.grad(lambda x: jnp.sum(jnp.where(x > 0, x, 0.0)))(x)
    np.testing.assert_allclose(g, [0.0, 1.0, 0.0])


def test_gather_scatter_grad():
    # Slice/at, operation.h:575-616: backward of gather = scatter into zeros.
    x = jnp.array([10.0, 20.0, 30.0, 40.0])
    idx = jnp.array([0, 2, 2])
    g = jax.grad(lambda x: jnp.sum(x[idx] * jnp.array([1.0, 2.0, 3.0])))(x)
    np.testing.assert_allclose(g, [1.0, 0.0, 5.0, 0.0])


def test_segment_sum_grad():
    # The TPU replacement for the scatter backward: segment_sum VJP = gather.
    data = jnp.arange(6.0)
    seg = jnp.array([0, 0, 1, 1, 2, 2])
    g = jax.grad(
        lambda d: jnp.sum(segment_sum(d, seg, 3) * jnp.array([1.0, 2.0, 3.0]))
    )(data)
    np.testing.assert_allclose(g, [1, 1, 2, 2, 3, 3])


def test_diamond_fanout_accumulation():
    # The reference handles fan-out only via grad accumulation
    # (tensor.h:268-271, exponential re-traversal); jax.grad does it right.
    x = jnp.array(2.0)
    f = lambda x: (x * x) + (x * x) + jnp.sin(x) * jnp.cos(x)
    g = jax.grad(f)(x)
    expected = 4 * 2.0 + np.cos(2.0) ** 2 - np.sin(2.0) ** 2
    np.testing.assert_allclose(g, expected, rtol=1e-6)
