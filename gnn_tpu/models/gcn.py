"""GCN models.

:class:`GCN` — the standard Kipf-Welling N-layer GCN (2-layer config matches
BASELINE.json's Cora target, ~0.81 test accuracy).

:class:`EncoderGCN` — the reference's flagship ``Model`` (src/main.cpp:10-30):
pre-encoder MLP(F -> 2F -> F) -> k x [GCNConv + tanh] -> post-decoder MLP to
n_classes, with the reference's mid-block (BatchNorm+ReLU inside each conv).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gnn_tpu.graphs.adjacency import Adjacency
from gnn_tpu.mp.gcn import GCNConv
from gnn_tpu.nn.activations import relu, tanh
from gnn_tpu.nn.containers import MLP
from gnn_tpu.nn.dropout import Dropout
from gnn_tpu.nn.module import Module, static_field
from gnn_tpu.nn.state import State

__all__ = ["GCN", "EncoderGCN"]


class GCN(Module):
    convs: Tuple[GCNConv, ...]
    dropout: Dropout
    num_layers: int = static_field(default=2)

    def __init__(
        self,
        in_features: int,
        hidden_features: int,
        out_features: int,
        *,
        key: jax.Array,
        num_layers: int = 2,
        dropout: float = 0.5,
        backend: str = "auto",
    ):
        keys = jax.random.split(key, num_layers)
        dims = (
            [in_features]
            + [hidden_features] * (num_layers - 1)
            + [out_features]
        )
        self.num_layers = num_layers
        self.convs = tuple(
            GCNConv(d_in, d_out, key=k, backend=backend)
            for d_in, d_out, k in zip(dims[:-1], dims[1:], keys)
        )
        self.dropout = Dropout(rate=dropout)

    def __call__(
        self,
        x: jax.Array,
        adj: Adjacency,
        *,
        key: Optional[jax.Array] = None,
    ) -> jax.Array:
        n = len(self.convs)
        keys = jax.random.split(key, n) if key is not None else [None] * n
        for i, conv in enumerate(self.convs):
            x = self.dropout(x, key=keys[i])
            x = conv(x, adj)
            if i < n - 1:
                x = relu(x)
        return x


class EncoderGCN(Module):
    """Reference flagship model (src/main.cpp:10-30): ``pre`` MLP ->
    [GCNConv with mid-block, tanh] x k -> ``post`` MLP -> logits."""

    pre: MLP
    convs: Tuple[GCNConv, ...]
    post: MLP
    num_layers: int = static_field(default=2)

    def __init__(
        self,
        in_features: int,
        n_classes: int,
        *,
        key: jax.Array,
        num_layers: int = 2,
        dropout: float = 0.0,
        backend: str = "auto",
    ):
        k_pre, k_post, *k_convs = jax.random.split(key, num_layers + 2)
        # pre: F -> 2F -> F (main.cpp:14); post: F -> n_classes (main.cpp:27)
        self.num_layers = num_layers
        self.pre = MLP(in_features, [2 * in_features, in_features], key=k_pre, dropout=dropout)
        self.convs = tuple(
            GCNConv(
                in_features,
                in_features,
                key=k,
                mid_block=True,
                dropout=dropout,
                backend=backend,
            )
            for k in k_convs
        )
        self.post = MLP(in_features, [n_classes], key=k_post)

    def __call__(
        self,
        x: jax.Array,
        adj: Adjacency,
        state: State,
        *,
        key: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
    ):
        """``mask`` ([N] bool): validity mask for the mid-block BatchNorm
        statistics — required when x is in the padded distributed node
        layout so padding rows don't skew the batch stats."""
        n = len(self.convs)
        keys = jax.random.split(key, n + 2) if key is not None else [None] * (n + 2)
        x = self.pre(x, key=keys[0])
        for i, conv in enumerate(self.convs):
            x, state = conv(x, adj, state, key=keys[i + 1], mask=mask)
            x = tanh(x)  # main.cpp:23-26: tanh between conv layers
        x = self.post(x, key=keys[-1])
        return x, state
