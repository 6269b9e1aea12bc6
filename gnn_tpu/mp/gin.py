"""GIN — Graph Isomorphism Network convolution.

    h_i = MLP((1 + eps) * x_i + sum_{j in N(i)} x_j)

Not in the reference; included to round out the message-passing family the
framework supports (sum aggregation exercises the plain unweighted SpMM).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gnn_tpu.graphs.adjacency import Adjacency
from gnn_tpu.mp.message_passing import MessagePassing
from gnn_tpu.nn.containers import MLP
from gnn_tpu.nn.module import static_field
from gnn_tpu.ops.spmm import spmm

__all__ = ["GINConv"]


class GINConv(MessagePassing):
    mlp: MLP
    eps: jax.Array
    train_eps: bool = static_field(default=False)

    def __init__(
        self,
        in_features: int,
        hidden_features,
        *,
        key: jax.Array,
        eps: float = 0.0,
        train_eps: bool = False,
    ):
        self.aggr = "sum"
        self.mlp = MLP(in_features, hidden_features, key=key, use_norm=True)
        self.eps = jnp.asarray(eps, jnp.float32)
        self.train_eps = train_eps

    def __call__(
        self,
        x: jax.Array,
        adj: Adjacency,
        x_dst=None,
        *,
        key=None,
    ) -> jax.Array:
        """``x``: source-node features. For bipartite/sampled hops pass
        ``x_dst`` [N_dst, F] (defaults to x for full-graph use)."""
        if x_dst is None:
            x_dst = x
        eps = self.eps if self.train_eps else jax.lax.stop_gradient(self.eps)
        agg = spmm(adj.with_weight(None), x)
        return self.mlp((1.0 + eps).astype(x.dtype) * x_dst + agg, key=key)
