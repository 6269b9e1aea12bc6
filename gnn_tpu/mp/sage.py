"""GraphSAGE convolution (mean aggregator).

No analog exists in the reference (its only conv is GCNConv); this is part
of the capability surface mandated by BASELINE.json config #3 ("GraphSAGE
mean-aggregator with minibatch neighbor sampling"). Standard SAGE:

    h_i = W_self x_i + W_neigh * mean_{j in N(i)} x_j   (+ optional L2 norm)

The mean aggregation is a row-normalized SpMM; with a bipartite (sampled)
adjacency the same code serves minibatch training.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gnn_tpu.graphs.adjacency import Adjacency
from gnn_tpu.mp.message_passing import MessagePassing
from gnn_tpu.nn.linear import Linear
from gnn_tpu.nn.module import static_field
from gnn_tpu.ops.segment import segment_mean, segment_sum, segment_max
from gnn_tpu.ops.sddmm import gather_src

__all__ = ["SAGEConv"]


class SAGEConv(MessagePassing):
    lin_self: Linear
    lin_neigh: Linear
    in_features: int = static_field(default=0)
    out_features: int = static_field(default=0)
    normalize: bool = static_field(default=False)

    def __init__(
        self,
        in_features: int,
        out_features: int,
        *,
        key: jax.Array,
        aggr: str = "mean",
        use_bias: bool = True,
        normalize: bool = False,
        dtype=jnp.float32,
    ):
        k1, k2 = jax.random.split(key)
        self.aggr = aggr
        self.in_features = in_features
        self.out_features = out_features
        self.normalize = normalize
        self.lin_self = Linear(in_features, out_features, key=k1, use_bias=use_bias, dtype=dtype)
        self.lin_neigh = Linear(in_features, out_features, key=k2, use_bias=False, dtype=dtype)

    def __call__(
        self,
        x: jax.Array,
        adj: Adjacency,
        x_dst: Optional[jax.Array] = None,
    ) -> jax.Array:
        """x: source-node features [N_src, F]. For bipartite/sampled graphs
        pass x_dst [N_dst, F] (defaults to x for full-graph use). A
        :class:`~gnn_tpu.parallel.DistGraph` runs the layer multi-chip
        (x in the padded [P*n_max, F] node layout)."""
        from gnn_tpu.parallel.partition import DistGraph

        if isinstance(adj, DistGraph):
            return self._forward_dist(x, adj)
        if x_dst is None:
            x_dst = x
        msgs = gather_src(x, adj.src)
        if adj.weight is not None:
            msgs = msgs * adj.weight[:, None].astype(msgs.dtype)
        if self.aggr == "mean":
            agg = segment_mean(msgs, adj.dst, adj.num_dst_nodes, indices_are_sorted=True)
        elif self.aggr == "sum":
            agg = segment_sum(msgs, adj.dst, adj.num_dst_nodes, indices_are_sorted=True)
        elif self.aggr == "max":
            agg = segment_max(msgs, adj.dst, adj.num_dst_nodes, indices_are_sorted=True)
            agg = jnp.where(jnp.isfinite(agg), agg, 0.0)
        else:
            raise ValueError(f"unknown aggr '{self.aggr}'")
        out = self.lin_self(x_dst) + self.lin_neigh(agg)
        if self.normalize:
            out = out / jnp.maximum(
                jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12
            )
        return out

    def _forward_dist(self, x_sh: jax.Array, dist) -> jax.Array:
        """Multi-chip SAGE over a node-partitioned graph.

        sum/mean ride the static-weight distributed SpMM (mean divides by
        the partition's stored in-degrees — exact, no extra comm); max rides
        the edge-parallel gather + local segment-max."""
        from gnn_tpu.ops.spmm import spmm
        from gnn_tpu.parallel.halo import edge_reduce_by_dst, gather_src_dist

        if self.aggr in ("mean", "sum"):
            # Matches the single-chip semantics above exactly: baked edge
            # weights (if the partition carries any, e.g. fit()'s sym-norm)
            # scale the messages, and 'mean' divides by the EDGE COUNT
            # (segment_mean's denominator), which is dist.in_degree.
            agg = spmm(dist, x_sh)
            if self.aggr == "mean":
                deg = dist.in_degree.reshape(-1)  # [P*n_max]
                agg = agg / jnp.maximum(deg, 1.0)[:, None].astype(agg.dtype)
        elif self.aggr == "max":
            if dist.has_weight:
                raise ValueError(
                    "SAGE aggr='max' on a weight-baked DistGraph: the "
                    "single-chip path maxes WEIGHTED messages, but baked "
                    "weights are not exposed in the edge-parallel order — "
                    "partition_graph without edge_weight for max aggregation"
                )
            msgs = gather_src_dist(dist, x_sh)
            agg = edge_reduce_by_dst(dist, msgs, op="max")
            deg = dist.in_degree.reshape(-1)
            agg = jnp.where(deg[:, None] > 0, agg, 0.0)  # -inf on deg-0 rows
        else:
            raise ValueError(f"unknown aggr '{self.aggr}'")
        out = self.lin_self(x_sh) + self.lin_neigh(agg)
        if self.normalize:
            out = out / jnp.maximum(
                jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12
            )
        return out
