"""Message-passing protocol.

Equivalent of the reference's ``graph::MessagePassing`` base
(include/graph.h:110-120, src/graph.cpp:153-158): PyG-style
``message -> aggregate -> update`` hooks behind a ``propagate`` driver. The
reference's aggregate densifies the adjacency and matmuls
(src/graph.cpp:204-212); here propagate compiles to gather + segment
reductions (or a fused SpMM fast path when the layer opts in), all
static-shape and XLA-fusable.

Hook semantics (naming follows the reference / PyG):
* ``message(x_i, x_j, edge_attr)``: per-edge messages; default returns
  ``x_j`` — the source features — exactly like the reference default
  (include/graph.h:114). x_i = destination features.
* ``aggregate(messages, dst, num_nodes)``: segment reduction by destination;
  ``aggr`` picks sum/mean/max/min.
* ``update(aggr_out, x)``: post-aggregation transform; default identity.
"""

from __future__ import annotations

from typing import Optional

import jax

from gnn_tpu.graphs.adjacency import Adjacency
from gnn_tpu.nn.module import Module, static_field
from gnn_tpu.ops import segment as seg
from gnn_tpu.ops.sddmm import gather_dst, gather_src

__all__ = ["MessagePassing"]

_AGGRS = ("sum", "mean", "max", "min")


class MessagePassing(Module):
    aggr: str = static_field(default="sum")

    def message(
        self,
        x_i: jax.Array,
        x_j: jax.Array,
        edge_attr: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Per-edge message; default = source features x_j
        (reference: include/graph.h:114)."""
        del x_i, edge_attr
        return x_j

    def aggregate(
        self, messages: jax.Array, dst: jax.Array, num_nodes: int
    ) -> jax.Array:
        if self.aggr not in _AGGRS:
            raise ValueError(f"unknown aggr '{self.aggr}', expected one of {_AGGRS}")
        fn = {
            "sum": seg.segment_sum,
            "mean": seg.segment_mean,
            "max": seg.segment_max,
            "min": seg.segment_min,
        }[self.aggr]
        out = fn(messages, dst, num_nodes, indices_are_sorted=True)
        if self.aggr in ("max", "min"):
            # Empty segments produce +-inf; zero them like PyG does.
            import jax.numpy as jnp

            out = jnp.where(jnp.isfinite(out), out, 0.0)
        return out

    def update(self, aggr_out: jax.Array, x: jax.Array) -> jax.Array:
        del x
        return aggr_out

    def propagate(
        self,
        adj: Adjacency,
        x: jax.Array,
        edge_attr: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Driver: gather endpoints -> message -> aggregate -> update
        (reference: MessagePassing::propagate, src/graph.cpp:153-158)."""
        x_j = gather_src(x, adj.src)
        x_i = gather_dst(x, adj.dst)
        msgs = self.message(x_i, x_j, edge_attr)
        out = self.aggregate(msgs, adj.dst, adj.num_dst_nodes)
        return self.update(out, x)
