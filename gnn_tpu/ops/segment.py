"""Segment reductions — the scatter side of message passing.

This is the TPU-native generalization of the reference's single
gather/scatter pair: the ``Slice`` op whose backward scatters into zeros
(reference: include/operation.h:575-616, include/functional.h:483-494).
On TPU, scatter-add with *sorted* segment ids lowers to an efficient
one-pass reduction, so all graph prep in this framework sorts edges by
destination and passes ``indices_are_sorted=True``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_min",
    "segment_softmax",
    "segment_normalize",
    "segment_sum_edges",
]


def segment_sum(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    *,
    indices_are_sorted: bool = False,
) -> jax.Array:
    return jax.ops.segment_sum(
        data, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )


def segment_mean(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    *,
    indices_are_sorted: bool = False,
) -> jax.Array:
    totals = segment_sum(
        data, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    counts = jax.ops.segment_sum(
        jnp.ones_like(segment_ids, dtype=data.dtype),
        segment_ids,
        num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    counts = jnp.maximum(counts, 1)
    return totals / counts.reshape((-1,) + (1,) * (data.ndim - 1))


def segment_max(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    *,
    indices_are_sorted: bool = False,
) -> jax.Array:
    return jax.ops.segment_max(
        data, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )


def segment_min(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    *,
    indices_are_sorted: bool = False,
) -> jax.Array:
    return jax.ops.segment_min(
        data, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )


def segment_softmax(
    logits: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    *,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Softmax within each segment (per-destination-node over incoming edges).

    This is the graph analog of attention softmax: for GAT, segments are a
    node's in-edges, so no sequence axis or ring trick is needed — the
    reduction rides the same sorted-segment machinery as aggregation.
    Numerically stabilized by the per-segment max shift (the same
    exp(x - max) trick the reference softmax uses, src/nn.cpp:270-283).
    """
    maxes = segment_max(
        jax.lax.stop_gradient(logits),
        segment_ids,
        num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    # Empty segments produce -inf maxes; they index nothing, but guard anyway.
    maxes = jnp.where(jnp.isfinite(maxes), maxes, 0.0)
    shifted = logits - maxes[segment_ids]
    exp = jnp.exp(shifted)
    denom = segment_sum(
        exp, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    denom = jnp.maximum(denom, 1e-16)
    return exp / denom[segment_ids]


def segment_normalize(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    *,
    p: float = 1.0,
    indices_are_sorted: bool = False,
    eps: float = 1e-12,
) -> jax.Array:
    """Normalize entries so each segment's Lp mass is 1."""
    mass = segment_sum(
        jnp.abs(data) ** p,
        segment_ids,
        num_segments,
        indices_are_sorted=indices_are_sorted,
    ) ** (1.0 / p)
    return data / jnp.maximum(mass[segment_ids], eps)


def segment_sum_edges(
    values: jax.Array,
    adj,
    *,
    backend: str = "auto",
    interpret: bool = False,
) -> jax.Array:
    """Per-edge values [E, ...] -> per-destination sums [N_dst, ...].

    Edge order is the adjacency's canonical dst-sorted order. Backends
    (same-session A/B at arxiv scale, docs/PERF.md round 5): 'pallas'
    (the one-hot MXU kernel) wins WIDE aggregations on TPU (~10 ms at
    [E, 256] vs ~26 ms for the slot tables — slot gathers pay the
    measured edge-TABLE gather penalty); 'agg' (ops/edge_agg.py slot
    tables) is backend-agnostic (bit-identical on CPU) and wins segment
    MAX (no kernel exists for max). 'auto' = kernel when available on
    TPU, slot tables otherwise, XLA sorted-segment for tiny graphs.
    All paths have scatter-free gather VJPs.
    """
    if backend == "agg" and getattr(adj, "edge_agg", None) is None:
        raise ValueError("adjacency has no edge_agg layout (layout='ell')")
    use_pallas = (
        adj.chunk_plan is not None
        and backend in ("auto", "pallas")
        and (interpret or jax.default_backend() != "cpu")
        and values.shape[0] >= adj.chunk_plan.chunk
    )
    if (
        backend == "agg"
        or (backend == "auto" and not use_pallas)
    ) and getattr(adj, "edge_agg", None) is not None:
        from gnn_tpu.ops.edge_agg import edge_aggregate

        shape = values.shape
        out = edge_aggregate(values.reshape(shape[0], -1), adj.edge_agg)
        return out.reshape((adj.num_dst_nodes,) + shape[1:])
    if backend == "pallas" and adj.chunk_plan is None:
        raise ValueError("adjacency has no chunk plan (build with layout='ell')")
    if not use_pallas:
        return segment_sum(
            values, adj.dst, adj.num_dst_nodes, indices_are_sorted=True
        )

    from gnn_tpu.ops.pallas.segment import segment_sum_sorted

    plan = adj.chunk_plan
    dst = adj.dst
    n_dst = adj.num_dst_nodes

    @jax.custom_vjp
    def fwd(v):
        shape = v.shape
        flat = v.reshape(shape[0], -1)
        width = flat.shape[1]
        pad = (-width) % 128  # Mosaic DMA wants lane-aligned rows
        if pad:
            flat = jnp.concatenate(
                [flat, jnp.zeros((flat.shape[0], pad), flat.dtype)], axis=1
            )
        out = segment_sum_sorted(flat, plan, n_dst, interpret=interpret)
        if pad:
            out = out[:, :width]
        return out.reshape((n_dst,) + shape[1:])

    def fwd_fwd(v):
        return fwd(v), None

    def fwd_bwd(_, g):
        # VJP of segment-sum = gather by destination.
        return (jnp.take(g, dst, axis=0),)

    fwd.defvjp(fwd_fwd, fwd_bwd)
    return fwd(values)
