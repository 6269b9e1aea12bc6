"""SGD with momentum / dampening / weight decay / Nesterov.

Capability-parity with the reference's ``nn::SGD`` knob set (include/nn.h:171,
src/nn.cpp:395-417), with the *intended* PyTorch update rule — the reference
forgets to size its velocity buffer and never applies the learning rate
(SURVEY.md §2.8); we implement the correct semantics:

    v <- mu * v + (1 - dampening) * g        (g includes weight decay)
    d <- g + mu * v   if nesterov else   v
    p <- p - lr * d
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gnn_tpu.optim.base import GradientTransformation

__all__ = ["sgd"]


def sgd(
    learning_rate: float | jax.Array,
    momentum: float = 0.0,
    dampening: float = 0.0,
    weight_decay: float = 0.0,
    nesterov: bool = False,
) -> GradientTransformation:
    if nesterov and (momentum <= 0 or dampening != 0):
        raise ValueError("Nesterov momentum requires momentum > 0 and dampening = 0")

    def init(params):
        if momentum == 0.0:
            return {"velocity": None}
        return {
            "velocity": jax.tree_util.tree_map(
                lambda p: None if p is None else jnp.zeros_like(p),
                params,
                is_leaf=lambda x: x is None,
            )
        }

    def update(grads, state, params=None):
        if weight_decay != 0.0:
            if params is None:
                raise ValueError("weight_decay requires passing params to update()")
            grads = jax.tree_util.tree_map(
                lambda g, p: None if g is None else g + weight_decay * p,
                grads,
                params,
                is_leaf=lambda x: x is None,
            )
        if momentum == 0.0:
            updates = jax.tree_util.tree_map(
                lambda g: None if g is None else -learning_rate * g,
                grads,
                is_leaf=lambda x: x is None,
            )
            return updates, state

        def upd_v(g, v):
            if g is None:
                return None
            return momentum * v + (1.0 - dampening) * g

        velocity = jax.tree_util.tree_map(
            upd_v, grads, state["velocity"], is_leaf=lambda x: x is None
        )

        def direction(g, v):
            if g is None:
                return None
            d = g + momentum * v if nesterov else v
            return -learning_rate * d

        updates = jax.tree_util.tree_map(
            direction, grads, velocity, is_leaf=lambda x: x is None
        )
        return updates, {"velocity": velocity}

    return GradientTransformation(init, update)
