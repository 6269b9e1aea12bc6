"""Graph representation converters.

Capability-parity with the reference's converter suite
(reference: include/graph.h:26-48, src/graph.cpp:10-75):

* ``vec_to_edge_list``  -> :func:`edge_list` (src/dst vectors -> [2, E])
* ``edge_to_adj_mat``   -> :func:`to_dense_adj`
* ``adj_to_edge_list``  -> :func:`dense_to_edge_list`
* ``add_self_loops``    -> :func:`~gnn_tpu.graphs.transforms.add_self_loops`
  (O(E) concatenation, not the reference's dense round-trip which silently
  drops zero-fill self loops, src/graph.cpp:68-75)

Dense conversion exists for tests/small graphs only; the compute path never
densifies (see :mod:`gnn_tpu.graphs.adjacency`).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = [
    "edge_list",
    "to_dense_adj",
    "dense_to_edge_list",
    "edge_list_to_csr",
    "csr_to_edge_list",
]


def edge_list(src: Sequence[int], dst: Sequence[int]) -> jnp.ndarray:
    """Source/destination id vectors -> COO [2, E] int32
    (reference: vec_to_edge_list, src/graph.cpp:10-19)."""
    src = np.asarray(src, np.int32)
    dst = np.asarray(dst, np.int32)
    if src.shape != dst.shape or src.ndim != 1:
        raise ValueError("src and dst must be 1-D sequences of equal length")
    return jnp.asarray(np.stack([src, dst]))


def to_dense_adj(
    edge_index,
    edge_weight=None,
    num_nodes: Optional[int] = None,
) -> jnp.ndarray:
    """COO -> dense [N, N] with optional weights fused in
    (reference: edge_to_adj_mat, src/graph.cpp:21-44). A[dst, src] = w so that
    ``A @ X`` aggregates source features into destinations, matching the
    reference's ``adj.mm(x)`` aggregation (src/graph.cpp:208)."""
    ei = np.asarray(edge_index)
    if num_nodes is None:
        num_nodes = int(ei.max()) + 1 if ei.size else 0
    adj = np.zeros((num_nodes, num_nodes), np.float32)
    w = np.ones(ei.shape[1], np.float32) if edge_weight is None else np.asarray(edge_weight)
    np.add.at(adj, (ei[1], ei[0]), w)
    return jnp.asarray(adj)


def dense_to_edge_list(adj) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense [N, N] -> (edge_index [2, E], edge_attr [E]) keeping nonzeros
    (reference: adj_to_edge_list, src/graph.cpp:46-67). Inverse of
    :func:`to_dense_adj`'s A[dst, src] convention."""
    a = np.asarray(adj)
    dst, src = np.nonzero(a)
    order = np.lexsort((src, dst))
    src, dst = src[order], dst[order]
    return (
        jnp.asarray(np.stack([src, dst]).astype(np.int32)),
        jnp.asarray(a[dst, src].astype(np.float32)),
    )


def edge_list_to_csr(
    edge_index, num_nodes: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """COO -> (row_ptr over dst, col_idx = src, perm). Host-side numpy."""
    ei = np.asarray(edge_index)
    src, dst = ei[0], ei[1]
    if num_nodes is None:
        num_nodes = int(ei.max()) + 1 if ei.size else 0
    order = np.lexsort((src, dst))
    src, dst = src[order], dst[order]
    row_ptr = np.zeros(num_nodes + 1, np.int64)
    np.add.at(row_ptr, dst + 1, 1)
    return np.cumsum(row_ptr), src.astype(np.int64), order


def csr_to_edge_list(row_ptr, col_idx) -> jnp.ndarray:
    """(row_ptr over dst, col_idx = src) -> COO [2, E]."""
    row_ptr = np.asarray(row_ptr)
    col_idx = np.asarray(col_idx)
    counts = np.diff(row_ptr)
    dst = np.repeat(np.arange(len(counts)), counts)
    return jnp.asarray(np.stack([col_idx, dst]).astype(np.int32))
