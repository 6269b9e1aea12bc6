"""Adam / AdamW.

Capability-parity with the reference's ``nn::Adam`` (include/nn.h:175-188,
src/nn.cpp:419-441), with the *intended* Kingma-Ba update — the reference has
``eps = 10-8`` (i.e. 2), multiplies by eps instead of adding it, and writes
``g - lr*m_hat/...`` into the parameter (SURVEY.md §2.8). Correct semantics:

    m <- b1*m + (1-b1)*g ;  v <- b2*v + (1-b2)*g^2
    m_hat = m/(1-b1^t) ;  v_hat = v/(1-b2^t)
    p <- p - lr * m_hat / (sqrt(v_hat) + eps)    [+ decoupled wd for AdamW]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gnn_tpu.optim.base import GradientTransformation

__all__ = ["adam", "adamw"]


def _tree_map(f, *trees):
    return jax.tree_util.tree_map(f, *trees, is_leaf=lambda x: x is None)


def adam(
    learning_rate: float | jax.Array,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    *,
    decoupled_weight_decay: bool = False,
) -> GradientTransformation:
    def init(params):
        zeros = _tree_map(
            lambda p: None if p is None else jnp.zeros_like(p), params
        )
        return {"count": jnp.zeros((), jnp.int32), "mu": zeros, "nu": zeros}

    def update(grads, state, params=None):
        if weight_decay != 0.0 and not decoupled_weight_decay:
            if params is None:
                raise ValueError("weight_decay requires passing params to update()")
            grads = _tree_map(
                lambda g, p: None if g is None else g + weight_decay * p,
                grads,
                params,
            )
        count = state["count"] + 1
        mu = _tree_map(
            lambda g, m: None if g is None else b1 * m + (1 - b1) * g,
            grads,
            state["mu"],
        )
        nu = _tree_map(
            lambda g, v: None if g is None else b2 * v + (1 - b2) * jnp.square(g),
            grads,
            state["nu"],
        )
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)

        def step(m, v, p):
            if m is None:
                return None
            m_hat = m / bc1
            v_hat = v / bc2
            upd = -learning_rate * m_hat / (jnp.sqrt(v_hat) + eps)
            if weight_decay != 0.0 and decoupled_weight_decay:
                upd = upd - learning_rate * weight_decay * p
            return upd

        if decoupled_weight_decay and weight_decay != 0.0:
            if params is None:
                raise ValueError("adamw requires passing params to update()")
            updates = _tree_map(step, mu, nu, params)
        else:
            updates = _tree_map(lambda m, v: step(m, v, None), mu, nu)
        return updates, {"count": count, "mu": mu, "nu": nu}

    return GradientTransformation(init, update)


def adamw(
    learning_rate: float | jax.Array,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-2,
) -> GradientTransformation:
    return adam(
        learning_rate,
        b1=b1,
        b2=b2,
        eps=eps,
        weight_decay=weight_decay,
        decoupled_weight_decay=True,
    )
