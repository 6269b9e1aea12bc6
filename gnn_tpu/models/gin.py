"""GIN model: stacked GINConv with sum readout option for graph-level tasks."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gnn_tpu.graphs.adjacency import Adjacency
from gnn_tpu.mp.gin import GINConv
from gnn_tpu.nn.containers import MLP
from gnn_tpu.nn.module import Module, static_field
from gnn_tpu.ops.segment import segment_sum

__all__ = ["GIN"]


class GIN(Module):
    convs: Tuple[GINConv, ...]
    head: MLP
    num_layers: int = static_field(default=2)

    def __init__(
        self,
        in_features: int,
        hidden_features: int,
        out_features: int,
        *,
        key: jax.Array,
        num_layers: int = 2,
        train_eps: bool = False,
    ):
        keys = jax.random.split(key, num_layers + 1)
        d = in_features
        convs = []
        for i in range(num_layers):
            convs.append(
                GINConv(d, [hidden_features, hidden_features], key=keys[i], train_eps=train_eps)
            )
            d = hidden_features
        self.num_layers = num_layers
        self.convs = tuple(convs)
        self.head = MLP(d, [out_features], key=keys[-1])

    def __call__(
        self,
        x: jax.Array,
        adj: Adjacency,
        *,
        key: Optional[jax.Array] = None,
        graph_id: Optional[jax.Array] = None,
        num_graphs: int = 0,
    ) -> jax.Array:
        """Node-level logits; pass ``graph_id``/``num_graphs`` (from
        graphs.Batch) for graph-level sum readout."""
        n = len(self.convs)
        keys = jax.random.split(key, n) if key is not None else [None] * n
        for conv, k in zip(self.convs, keys):
            x = conv(x, adj, key=k)
        if graph_id is not None:
            x = segment_sum(x, graph_id, num_graphs)
        return self.head(x)

    def forward_sampled(
        self,
        x: jax.Array,
        adjs,
        *,
        key: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Minibatch forward over per-hop bipartite adjacencies (outermost
        first) — same protocol as GraphSAGE.forward_sampled."""
        n = len(self.convs)
        if len(adjs) != n:
            raise ValueError(f"need {n} hop adjacencies, got {len(adjs)}")
        keys = jax.random.split(key, n) if key is not None else [None] * n
        for conv, adj, k in zip(self.convs, adjs, keys):
            x = conv(x, adj, x[: adj.num_dst_nodes], key=k)
        return self.head(x)
