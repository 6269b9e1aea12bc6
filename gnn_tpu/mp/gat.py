"""GAT — graph attention convolution (multi-head).

No analog in the reference (it has no attention anywhere; SURVEY.md §2
parallelism table maps "sequence attention" capabilities to this per-edge
formulation). BASELINE.json config #4: "GAT multi-head attention (fused
SDDMM + softmax + SpMM kernels)".

Per head (GATv1, Velickovic et al.):

    e_ij = LeakyReLU(a_dst . (W x_i) + a_src . (W x_j))      -- SDDMM
    alpha_ij = softmax over j in N(i) of e_ij                 -- segment softmax
    h_i = sum_j alpha_ij (W x_j)                              -- SpMM

All three stages are edge-parallel segment ops over the dst-sorted CSR, so
the whole layer is two gathers, elementwise VPU work, and two sorted
segment reductions — no sequence axis, no ring.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gnn_tpu.graphs.adjacency import Adjacency
from gnn_tpu.mp.message_passing import MessagePassing
from gnn_tpu.nn import init as init_lib
from gnn_tpu.nn.activations import leaky_relu
from gnn_tpu.nn.dropout import dropout as dropout_fn
from gnn_tpu.nn.linear import Linear
from gnn_tpu.nn.module import static_field
from gnn_tpu.ops.gather import gather_dst_edges, gather_src_edges
from gnn_tpu.ops.segment import (
    segment_max,
    segment_softmax,
    segment_sum,
    segment_sum_edges,
)

__all__ = ["GATConv"]


def _segment_max_shift(adj: Adjacency, e: jax.Array) -> jax.Array:
    """Per-destination-segment max of edge scores, gathered back per edge.

    Softmax is shift-invariant only *within* a segment, so the shift must be
    per-segment: a global max underflows every segment whose logits sit far
    below it (exp -> 0 for the whole segment, and the denominator guard then
    silently zeroes the node's output). The [E, H] scatter-max is cheap
    relative to the [E, H*F] numerator work."""
    if adj.edge_agg is not None:
        # gather-rate segment max (ops/edge_agg.py) — XLA's scatter-max
        # pays the same per-row scatter penalty as scatter-add
        from gnn_tpu.ops.edge_agg import edge_aggregate_max

        m = edge_aggregate_max(jax.lax.stop_gradient(e), adj.edge_agg)
    else:
        m = segment_max(
            jax.lax.stop_gradient(e),
            adj.dst,
            adj.num_dst_nodes,
            indices_are_sorted=True,
        )
    m = jnp.where(jnp.isfinite(m), m, 0.0)  # empty segments
    return m[adj.dst]


def _edge_softmax(adj: Adjacency, e: jax.Array) -> jax.Array:
    """Softmax over each destination's in-edges.

    When the adjacency carries a Pallas chunk plan, the denominator rides
    the one-hot-matmul segment-sum kernel instead of XLA's scatter; the
    numerator-stabilizing shift is per-segment either way."""
    if adj.chunk_plan is not None:
        ex = jnp.exp(e - _segment_max_shift(adj, e))
        denom = segment_sum_edges(ex, adj)
        return ex / jnp.maximum(denom[adj.dst], 1e-16)
    return segment_softmax(
        e, adj.dst, adj.num_dst_nodes, indices_are_sorted=True
    )


class GATConv(MessagePassing):
    lin: Linear
    att_src: jax.Array  # [H, F_head]
    att_dst: jax.Array  # [H, F_head]
    bias: Optional[jax.Array]
    in_features: int = static_field(default=0)
    out_features: int = static_field(default=0)
    heads: int = static_field(default=1)
    concat: bool = static_field(default=True)
    negative_slope: float = static_field(default=0.2)
    dropout_rate: float = static_field(default=0.0)
    inference: bool = static_field(default=False)
    # Edge-message storage dtype (None = x.dtype). bfloat16 halves every
    # edge-wide row — the gathers at [E, 256] widths are bandwidth-
    # sensitive (measured fwd+bwd 251 -> 190 ms per layer at arxiv scale);
    # attention scores, softmax and the denominator stay f32 regardless.
    message_dtype: object = static_field(default=None)

    def __init__(
        self,
        in_features: int,
        out_features: int,
        *,
        key: jax.Array,
        heads: int = 1,
        concat: bool = True,
        negative_slope: float = 0.2,
        dropout: float = 0.0,
        use_bias: bool = True,
        dtype=jnp.float32,
        message_dtype=None,
    ):
        k_lin, k_src, k_dst, k_bias = jax.random.split(key, 4)
        self.aggr = "sum"
        self.in_features = in_features
        self.out_features = out_features
        self.heads = heads
        self.concat = concat
        self.negative_slope = negative_slope
        self.dropout_rate = dropout
        self.inference = False
        self.message_dtype = message_dtype
        self.lin = Linear(
            in_features, heads * out_features, key=k_lin, use_bias=False, dtype=dtype
        )
        self.att_src = init_lib.glorot_uniform(k_src, (heads, out_features), dtype)
        self.att_dst = init_lib.glorot_uniform(k_dst, (heads, out_features), dtype)
        out_dim = heads * out_features if concat else out_features
        self.bias = jnp.zeros((out_dim,), dtype) if use_bias else None

    def __call__(
        self,
        x: jax.Array,
        adj: Adjacency,
        *,
        key: Optional[jax.Array] = None,
        return_attention: bool = False,
    ):
        from gnn_tpu.parallel.partition import DistGraph

        if isinstance(adj, DistGraph):
            if return_attention:
                raise ValueError(
                    "return_attention is single-chip only (per-edge alphas "
                    "live in the chips' local edge orders)"
                )
            return self._forward_dist(x, adj, key=key)
        N, H, F = x.shape[0], self.heads, self.out_features
        N_out = adj.num_dst_nodes  # < N for bipartite (sampled) hops
        E = adj.num_edges
        h = self.lin(x).reshape(N, H, F)  # [N, H, F]
        # a_src . h is a per-NODE quantity: compute it once [N, H] and ride
        # it through the SAME source gather as the features (3% wider rows
        # instead of an [E, H, F] per-edge einsum + its backward — the
        # trick the distributed path always used). One gather per endpoint,
        # scatter-free VJPs (ops/gather.py): the backward is a single
        # transpose-sorted reduction instead of an unsorted XLA scatter.
        alpha_src = jnp.einsum("nhf,hf->nh", h, self.att_src)  # [N, H]
        alpha_dst = jnp.einsum("nhf,hf->nh", h, self.att_dst)  # [N, H]
        mdt = self.message_dtype or x.dtype
        cat_src = gather_src_edges(
            jnp.concatenate([h.reshape(N, H * F), alpha_src], axis=1).astype(
                mdt
            ),
            adj,
        )  # [E, H*F + H]
        h_src = cat_src[:, : H * F].reshape(E, H, F)
        # SDDMM: e[e,h] = act(a_dst.x_i + a_src.x_j). Destination scores are
        # sliced to the dst rows first (bipartite sampled hops: the dst set
        # is the frontier prefix; no-op on full graphs). Scores in f32.
        e = gather_dst_edges(alpha_dst[:N_out], adj) + cat_src[
            :, H * F :
        ].astype(jnp.float32)
        e = leaky_relu(e, self.negative_slope)
        if (
            adj.edge_agg is not None or adj.chunk_plan is not None
        ) and not return_attention:
            # Flash path, per-piece winners of the round-5 same-session
            # config sweep (docs/PERF.md): the [E, H*F] numerator rides the
            # one-hot MXU kernel where available (~10 ms at [E, 256] —
            # slot-table gathers pay the measured edge-TABLE gather
            # penalty and lose at ~26 ms); the [E, H] softmax denominator
            # and the stabilizing segment-max ride the slot tables
            # (ops/edge_agg.py — beat the XLA scatter/scatter-max by
            # ~8 + 7 ms). ``message_dtype=bfloat16`` additionally halves
            # every edge-wide row (gathers at these widths are
            # bandwidth-sensitive): fwd+bwd 251 -> 190 ms per layer
            # measured; softmax scores/denominator stay f32.
            ex = jnp.exp(e - _segment_max_shift(adj, e))  # [E, H]
            ex_num = (
                dropout_fn(key, ex, self.dropout_rate)
                if self.dropout_rate > 0 and not self.inference
                else ex
            )
            numerator = (
                ex_num.astype(h_src.dtype)[:, :, None] * h_src
            ).reshape(E, H * F)
            num = segment_sum_edges(numerator, adj).astype(jnp.float32)
            num = num.reshape(adj.num_dst_nodes, H, F)
            den = segment_sum_edges(
                ex, adj, backend="agg" if adj.edge_agg is not None else "auto"
            )
            out = num / jnp.maximum(den, 1e-16)[:, :, None]
        else:
            alpha = _edge_softmax(adj, e)  # [E, H]
            if self.dropout_rate > 0 and not self.inference:
                alpha = dropout_fn(key, alpha, self.dropout_rate)
            msgs = h_src * alpha[:, :, None]  # [E, H, F]
            out = segment_sum_edges(msgs, adj)  # [N, H, F]
        if self.concat:
            out = out.reshape(N_out, H * F)
        else:
            out = jnp.mean(out, axis=1)
        if self.bias is not None:
            out = out + self.bias.astype(out.dtype)
        if return_attention:
            return out, alpha
        return out

    def _forward_dist(
        self, x_sh: jax.Array, dist, *, key: Optional[jax.Array] = None
    ) -> jax.Array:
        """Multi-chip GAT over a node-partitioned graph (flash-style).

        One halo exchange moves [W x | a_src.(W x)] per node; scores,
        per-segment softmax and the fused numerator/denominator reduction
        are then purely LOCAL (forward edges live with their destination's
        owner, so each node's attention softmax never crosses chips). The
        only backward collective is gather_src_dist's reverse all_to_all."""
        from gnn_tpu.parallel.halo import (
            edge_reduce_by_dst,
            edge_valid_mask,
            gather_dst_dist,
            gather_src_dist,
        )

        H, F = self.heads, self.out_features
        N = x_sh.shape[0]  # P * n_max
        h = self.lin(x_sh)  # [N, H*F]; padding rows stay zero (no bias)
        hh = h.reshape(N, H, F)
        alpha_src = jnp.einsum("nhf,hf->nh", hh, self.att_src)
        alpha_dst = jnp.einsum("nhf,hf->nh", hh, self.att_dst)
        # Single exchange for features + source attention halves.
        ecat = gather_src_dist(
            dist, jnp.concatenate([h, alpha_src], axis=1)
        )  # [P*E_max, H*F+H]
        h_src = ecat[:, : H * F].reshape(-1, H, F)
        e = ecat[:, H * F :] + gather_dst_dist(dist, alpha_dst)  # [E, H]
        e = leaky_relu(e, self.negative_slope)
        valid = edge_valid_mask(dist)[:, None]
        neg = jnp.finfo(e.dtype).min
        e = jnp.where(valid, e, neg)
        # Per-segment max shift (local: segments = owned dst's in-edges).
        m = edge_reduce_by_dst(dist, jax.lax.stop_gradient(e), op="max")
        m = jnp.where(m > neg / 2, m, 0.0)  # empty / padding-only segments
        ex = jnp.exp(e - gather_dst_dist(dist, jax.lax.stop_gradient(m)))
        ex = jnp.where(valid, ex, 0.0)
        ex_num = (
            dropout_fn(key, ex, self.dropout_rate)
            if self.dropout_rate > 0 and not self.inference
            else ex
        )
        combined = jnp.concatenate(
            [(ex_num[:, :, None] * h_src).reshape(-1, H * F), ex], axis=1
        )
        agg = edge_reduce_by_dst(dist, combined)  # [N, H*F+H]
        num = agg[:, : H * F].reshape(N, H, F)
        den = agg[:, H * F :]
        out = num / jnp.maximum(den, 1e-16)[:, :, None]
        if self.concat:
            out = out.reshape(N, H * F)
        else:
            out = jnp.mean(out, axis=1)
        if self.bias is not None:
            out = out + self.bias.astype(out.dtype)
        return out
