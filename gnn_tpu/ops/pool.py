"""Graph-level readout (global pooling) over batched graphs.

The reference's ``DataBatch`` is an empty stub (reference: include/
graph.h:104-109) — batching and graph-level readout are part of the intended
capability surface it never reached. Here a :class:`gnn_tpu.graphs.Batch`
assigns each node a ``graph_id``; pooling is a sorted segment reduction
(block-diagonal batching keeps ids ascending, so the TPU lowering is a
one-pass reduction, never an unsorted scatter).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gnn_tpu.ops.segment import segment_max, segment_mean, segment_sum

__all__ = ["global_add_pool", "global_mean_pool", "global_max_pool"]


def global_add_pool(
    x: jax.Array, graph_id: jax.Array, num_graphs: int
) -> jax.Array:
    """[N, F] node features -> [num_graphs, F] per-graph sums."""
    return segment_sum(x, graph_id, num_graphs, indices_are_sorted=True)


def global_mean_pool(
    x: jax.Array, graph_id: jax.Array, num_graphs: int
) -> jax.Array:
    """[N, F] node features -> [num_graphs, F] per-graph means."""
    return segment_mean(x, graph_id, num_graphs, indices_are_sorted=True)


def global_max_pool(
    x: jax.Array, graph_id: jax.Array, num_graphs: int
) -> jax.Array:
    """[N, F] node features -> [num_graphs, F] per-graph maxima (empty
    graphs yield 0, matching the mean/sum conventions).

    Emptiness is masked explicitly by per-graph node counts — not by
    ``isfinite`` — so legitimate +/-inf maxima survive, NaNs propagate,
    and integer dtypes get the documented 0 instead of ``iinfo.min``."""
    out = segment_max(x, graph_id, num_graphs, indices_are_sorted=True)
    counts = segment_sum(
        jnp.ones_like(graph_id), graph_id, num_graphs, indices_are_sorted=True
    )
    return jnp.where(counts[:, None] > 0, out, jnp.zeros((), out.dtype))
