"""GAT model (BASELINE.json config #4): multi-head attention layers with ELU,
concat on hidden layers and mean on the output layer (Velickovic et al.)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from gnn_tpu.graphs.adjacency import Adjacency
from gnn_tpu.mp.gat import GATConv
from gnn_tpu.nn.activations import elu
from gnn_tpu.nn.dropout import Dropout
from gnn_tpu.nn.module import Module, static_field

__all__ = ["GAT"]


class GAT(Module):
    convs: Tuple[GATConv, ...]
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
        heads: int = 8,
        out_heads: int = 1,
        dropout: float = 0.6,
        message_dtype=None,
    ):
        keys = jax.random.split(key, num_layers)
        self.num_layers = num_layers
        convs = []
        d_in = in_features
        for i in range(num_layers):
            last = i == num_layers - 1
            convs.append(
                GATConv(
                    d_in,
                    out_features if last else hidden_features,
                    key=keys[i],
                    heads=out_heads if last else heads,
                    concat=not last,
                    dropout=dropout,
                    message_dtype=message_dtype,
                )
            )
            d_in = hidden_features * heads
        self.convs = tuple(convs)
        self.dropout = Dropout(rate=dropout)

    def __call__(
        self,
        x: jax.Array,
        adj: Adjacency,
        *,
        key: Optional[jax.Array] = None,
    ) -> jax.Array:
        n = len(self.convs)
        keys = jax.random.split(key, 2 * n) if key is not None else [None] * (2 * n)
        for i, conv in enumerate(self.convs):
            x = self.dropout(x, key=keys[2 * i])
            x = conv(x, adj, key=keys[2 * i + 1])
            if i < n - 1:
                x = elu(x)
        return x

    def forward_sampled(
        self,
        x: jax.Array,
        adjs,
        *,
        key: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Minibatch forward over per-hop bipartite adjacencies (outermost
        first), as produced by neighbor sampling — same protocol as
        GraphSAGE.forward_sampled. After hop i only the first
        ``adjs[i].num_dst_nodes`` rows remain valid."""
        n = len(self.convs)
        if len(adjs) != n:
            raise ValueError(f"need {n} hop adjacencies, got {len(adjs)}")
        keys = jax.random.split(key, n) if key is not None else [None] * n
        for i, (conv, adj) in enumerate(zip(self.convs, adjs)):
            x = conv(x, adj, key=keys[i])
            if i < n - 1:
                x = elu(x)
        return x
