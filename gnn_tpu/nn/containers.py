"""Container modules: Sequential and the MLP convenience stack.

Equivalents of the reference's ``nn::Sequential`` fold (src/nn.cpp:219-227)
and ``nn::MLP`` (include/nn.h:193-214: Linear -> LayerNorm -> ReLU -> Dropout
per block). Containers thread the PRNG key and the State store through
layers that need them, so heterogeneous stacks compose without boilerplate.
"""

from __future__ import annotations

import inspect
from typing import Optional, Sequence, Tuple

import jax

from gnn_tpu.nn.activations import ReLU
from gnn_tpu.nn.dropout import Dropout
from gnn_tpu.nn.linear import Linear
from gnn_tpu.nn.module import Module
from gnn_tpu.nn.normalization import LayerNorm
from gnn_tpu.nn.state import State

__all__ = ["Sequential", "MLP", "call_layer"]


def _accepts(fn, name: str) -> bool:
    try:
        params = inspect.signature(fn).parameters
    except (TypeError, ValueError):
        return False
    return name in params


def call_layer(layer, x, *, key: Optional[jax.Array] = None, state: Optional[State] = None):
    """Invoke ``layer(x)`` passing key/state only if its signature takes them.
    Returns ``(y, state)``."""
    fn = layer.__call__
    kwargs = {}
    takes_state = _accepts(fn, "state")
    if takes_state:
        out = fn(x, state, **({"key": key} if _accepts(fn, "key") else {}))
        y, state = out
        return y, state
    if _accepts(fn, "key"):
        kwargs["key"] = key
    return fn(x, **kwargs), state


class Sequential(Module):
    layers: Tuple[Module, ...]

    def __init__(self, layers: Sequence[Module]):
        self.layers = tuple(layers)

    def __call__(
        self,
        x,
        *,
        key: Optional[jax.Array] = None,
        state: Optional[State] = None,
    ):
        keys = (
            jax.random.split(key, len(self.layers))
            if key is not None
            else [None] * len(self.layers)
        )
        for layer, k in zip(self.layers, keys):
            x, state = call_layer(layer, x, key=k, state=state)
        if state is None:
            return x
        return x, state

    def __getitem__(self, i):
        return self.layers[i]

    def __len__(self):
        return len(self.layers)


class MLP(Module):
    """Stack of [Linear -> LayerNorm -> ReLU -> Dropout] blocks with a plain
    Linear head — the reference MLP recipe (include/nn.h:196-210)."""

    blocks: Sequential

    def __init__(
        self,
        in_features: int,
        hidden_features: Sequence[int],
        *,
        key: jax.Array,
        dropout: float = 0.0,
        use_norm: bool = True,
        use_bias: bool = True,
    ):
        dims = [in_features, *hidden_features]
        keys = jax.random.split(key, max(len(dims) - 1, 1))
        layers = []
        for i, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:])):
            layers.append(Linear(d_in, d_out, key=keys[i], use_bias=use_bias))
            is_last = i == len(dims) - 2
            if not is_last:
                if use_norm:
                    layers.append(LayerNorm(d_out))
                layers.append(ReLU())
                if dropout > 0:
                    layers.append(Dropout(rate=dropout))
        self.blocks = Sequential(layers)

    def __call__(self, x, *, key=None, state: Optional[State] = None):
        return self.blocks(x, key=key, state=state)
