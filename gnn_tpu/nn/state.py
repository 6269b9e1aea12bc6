"""Functional state store for non-trainable, mutable-by-convention values.

The reference keeps buffers (e.g. BatchNorm running statistics) in a mutable
``_buffers`` registry on each module (reference: include/nn.h:60,
src/nn.cpp:19-22, 285-330). In a functional framework the model pytree must
hold only trainable leaves, so buffers live in a separate :class:`State`
pytree threaded through the forward pass:

    model, state = make_with_state(GCN)(...)
    y, state = model(x, graph, state=state)

Each stateful layer owns a :class:`StateIndex` (created at construction) that
keys its slot in the store. ``State`` is itself a pytree, so it passes through
``jax.jit`` / ``jax.lax.scan`` untouched.
"""

from __future__ import annotations

import itertools
from typing import Any, Dict

import jax

from gnn_tpu.nn.module import Module, static_field

__all__ = ["StateIndex", "State", "init_state", "make_with_state"]

_counter = itertools.count()


class StateIndex(Module):
    """A typed key into a :class:`State` store, plus the initial value.

    The ``marker`` is static (identifies the slot); ``init`` holds the initial
    buffer pytree and is replaced by ``None`` once captured into a State.
    """

    init: Any
    marker: int = static_field(default_factory=lambda: next(_counter))


class State:
    """Immutable mapping from StateIndex markers to buffer pytrees."""

    def __init__(self, mapping: Dict[int, Any]):
        self._mapping = dict(mapping)

    def get(self, index: StateIndex) -> Any:
        try:
            return self._mapping[index.marker]
        except KeyError:
            raise KeyError(
                "StateIndex not found in State. Did you initialize the state "
                "with init_state(model) / make_with_state?"
            ) from None

    def set(self, index: StateIndex, value: Any) -> "State":
        if index.marker not in self._mapping:
            raise KeyError("StateIndex not found in State")
        new = dict(self._mapping)
        new[index.marker] = value
        return State(new)

    def __repr__(self):
        return f"State({self._mapping!r})"


def _state_flatten(s: State):
    keys = sorted(s._mapping)
    return [s._mapping[k] for k in keys], tuple(keys)


def _state_unflatten(keys, values):
    return State(dict(zip(keys, values)))


jax.tree_util.register_pytree_node(State, _state_flatten, _state_unflatten)


def init_state(model) -> State:
    """Collect every StateIndex in ``model`` into a fresh State store."""
    mapping: Dict[int, Any] = {}

    def visit(node):
        if isinstance(node, StateIndex):
            mapping[node.marker] = node.init
            return True  # treat as leaf; don't recurse into init
        return False

    jax.tree_util.tree_flatten(model, is_leaf=visit)
    return State(mapping)


def _strip_init(model):
    """Replace captured ``init`` values with None so the model pytree holds
    each buffer exactly once (in the State, not the model)."""

    def strip(node):
        if isinstance(node, StateIndex):
            return StateIndex(init=None, marker=node.marker)
        return node

    return jax.tree_util.tree_map(
        strip, model, is_leaf=lambda n: isinstance(n, StateIndex)
    )


def make_with_state(cls):
    """``make_with_state(Model)(*args, **kw) -> (model, state)``."""

    def ctor(*args, **kwargs):
        model = cls(*args, **kwargs)
        state = init_state(model)
        return _strip_init(model), state

    return ctor
