"""Optimizer core.

TPU-native replacement for the reference's ``nn::Optimizer`` hierarchy
(include/nn.h:156-188, src/nn.cpp:387-441). The reference mutates parameter
tensors in place from a held pointer list; here an optimizer is a pure
``(init, update)`` pair over the parameter pytree — the optax
GradientTransformation protocol — so our optimizers compose with optax
schedules/chains and run inside one jitted train step (params, grads, and
optimizer state all stay resident in HBM between steps; no host round-trips).

``zero_grad`` (reference: src/nn.cpp:387-393) has no equivalent: ``jax.grad``
returns fresh gradients each step.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["GradientTransformation", "apply_updates", "chain", "clip_by_global_norm"]


class GradientTransformation(NamedTuple):
    """Same protocol as optax.GradientTransformation."""

    init: Callable[[Any], Any]
    update: Callable[..., Any]  # (grads, state, params=None) -> (updates, state)


def apply_updates(params, updates):
    """params + updates, skipping None leaves (non-trainable slots)."""
    return jax.tree_util.tree_map(
        lambda p, u: None if p is None else (p + u).astype(p.dtype),
        params,
        updates,
        is_leaf=lambda x: x is None,
    )


def chain(*transforms: GradientTransformation) -> GradientTransformation:
    def init(params):
        return tuple(t.init(params) for t in transforms)

    def update(grads, state, params=None):
        new_state = []
        for t, s in zip(transforms, state):
            grads, s = t.update(grads, s, params)
            new_state.append(s)
        return grads, tuple(new_state)

    return GradientTransformation(init, update)


def clip_by_global_norm(max_norm: float) -> GradientTransformation:
    def init(params):
        del params
        return ()

    def update(grads, state, params=None):
        del params
        leaves = [g for g in jax.tree_util.tree_leaves(grads) if g is not None]
        gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))
        scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-12))
        return jax.tree_util.tree_map(lambda g: g * scale, grads), state

    return GradientTransformation(init, update)
