"""GraphSAGE model (BASELINE.json config #3)."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax

from gnn_tpu.graphs.adjacency import Adjacency
from gnn_tpu.mp.sage import SAGEConv
from gnn_tpu.nn.activations import relu
from gnn_tpu.nn.dropout import Dropout
from gnn_tpu.nn.module import Module, static_field

__all__ = ["GraphSAGE"]


class GraphSAGE(Module):
    convs: Tuple[SAGEConv, ...]
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
        aggr: str = "mean",
        dropout: float = 0.5,
    ):
        keys = jax.random.split(key, num_layers)
        dims = [in_features] + [hidden_features] * (num_layers - 1) + [out_features]
        self.num_layers = num_layers
        self.convs = tuple(
            SAGEConv(d_in, d_out, key=k, aggr=aggr)
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
            x = conv(x, adj)
            if i < n - 1:
                x = relu(x)
                x = self.dropout(x, key=keys[i])
        return x

    def forward_sampled(
        self,
        x: jax.Array,
        adjs: Sequence[Adjacency],
        *,
        key: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Minibatch forward over a list of per-hop bipartite adjacencies
        (outermost hop first), as produced by neighbor sampling. After hop i,
        only the first ``adjs[i].num_dst_nodes`` rows remain valid."""
        n = len(self.convs)
        if len(adjs) != n:
            raise ValueError(f"need {n} hop adjacencies, got {len(adjs)}")
        keys = jax.random.split(key, n) if key is not None else [None] * n
        for i, (conv, adj) in enumerate(zip(self.convs, adjs)):
            x_dst = x[: adj.num_dst_nodes]
            x = conv(x, adj, x_dst)
            if i < n - 1:
                x = relu(x)
                x = self.dropout(x, key=keys[i])
        return x
