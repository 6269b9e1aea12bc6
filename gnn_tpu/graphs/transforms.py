"""Graph preprocessing transforms.

Host-side (numpy) one-time prep: self loops, symmetric/row normalization,
coalescing, undirected closure. The key semantic upgrade over the reference:
:func:`gcn_norm` computes the *exact* per-edge weight d_i^-1/2 d_j^-1/2 of
D^-1/2 (A + I) D^-1/2 once at prep time, whereas the reference applies a
per-destination scalar sum_j d_i^-1/2 d_j^-1/2 *after* aggregation — an
explicit approximation (reference: src/graph.cpp:178-185 and the author's
comment at 196-199). SURVEY.md §2.11 / BASELINE.json direct parity against
the correct (PyG) formulation, which this is.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

__all__ = [
    "add_self_loops",
    "add_remaining_self_loops",
    "remove_self_loops",
    "coalesce",
    "to_undirected",
    "gcn_norm",
    "degree",
]


def _as_np(edge_index) -> np.ndarray:
    ei = np.asarray(edge_index)
    if ei.ndim != 2 or ei.shape[0] != 2:
        raise ValueError(f"edge_index must be [2, E], got {ei.shape}")
    return ei


def add_self_loops(
    edge_index,
    edge_weight=None,
    fill_value: float = 1.0,
    num_nodes: Optional[int] = None,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Append (i, i) for every node (reference: add_self_loops,
    src/graph.cpp:68-75 — which round-trips through a dense matrix and, with
    its default fill of 0, drops the loops again; we append directly)."""
    ei = _as_np(edge_index)
    if num_nodes is None:
        num_nodes = int(ei.max()) + 1 if ei.size else 0
    loops = np.arange(num_nodes, dtype=ei.dtype)
    out = np.concatenate([ei, np.stack([loops, loops])], axis=1)
    if edge_weight is None:
        return out, None
    w = np.asarray(edge_weight)
    return out, np.concatenate([w, np.full(num_nodes, fill_value, w.dtype)])


def add_remaining_self_loops(
    edge_index,
    edge_weight=None,
    fill_value: float = 1.0,
    num_nodes: Optional[int] = None,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Append (i, i) only for nodes that don't already have a self loop
    (PyG ``add_remaining_self_loops`` semantics — avoids double-counting when
    the input graph already contains loops)."""
    ei = _as_np(edge_index)
    if num_nodes is None:
        num_nodes = int(ei.max()) + 1 if ei.size else 0
    has_loop = np.zeros(num_nodes, bool)
    loop_mask = ei[0] == ei[1]
    has_loop[ei[0][loop_mask]] = True
    missing = np.nonzero(~has_loop)[0].astype(ei.dtype)
    out = np.concatenate([ei, np.stack([missing, missing])], axis=1)
    if edge_weight is None:
        return out, None
    w = np.asarray(edge_weight)
    return out, np.concatenate([w, np.full(len(missing), fill_value, w.dtype)])


def remove_self_loops(
    edge_index, edge_weight=None
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    ei = _as_np(edge_index)
    keep = ei[0] != ei[1]
    return ei[:, keep], None if edge_weight is None else np.asarray(edge_weight)[keep]


def coalesce(
    edge_index,
    edge_weight=None,
    num_nodes: Optional[int] = None,
    reduce: str = "sum",
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Sort by (dst, src) and merge duplicate edges (summing weights)."""
    ei = _as_np(edge_index)
    src, dst = ei[0].astype(np.int64), ei[1].astype(np.int64)
    if num_nodes is not None and src.size:
        # O(E+N) native counting sort when available (gnn_tpu.native).
        from gnn_tpu import native

        order, _ = native.sort_edges_csr(src, dst, num_nodes)
    else:
        order = np.lexsort((src, dst))
    src, dst = src[order], dst[order]
    key = np.stack([dst, src], axis=1)
    uniq_mask = np.ones(len(src), bool)
    if len(src):
        uniq_mask[1:] = np.any(key[1:] != key[:-1], axis=1)
    idx = np.cumsum(uniq_mask) - 1
    out = np.stack([src[uniq_mask], dst[uniq_mask]])
    if edge_weight is None:
        return out, None
    w = np.asarray(edge_weight)[order]
    if reduce == "sum":
        merged = np.zeros(uniq_mask.sum(), w.dtype)
        np.add.at(merged, idx, w)
    elif reduce == "max":
        merged = np.full(uniq_mask.sum(), -np.inf, w.dtype)
        np.maximum.at(merged, idx, w)
    elif reduce == "mean":
        merged = np.zeros(uniq_mask.sum(), w.dtype)
        counts = np.zeros(uniq_mask.sum(), np.int64)
        np.add.at(merged, idx, w)
        np.add.at(counts, idx, 1)
        merged = merged / np.maximum(counts, 1)
    else:
        raise ValueError(f"unknown reduce '{reduce}'")
    return out, merged


def to_undirected(
    edge_index, edge_weight=None, num_nodes: Optional[int] = None
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Symmetrize: add reversed edges, then coalesce duplicates."""
    ei = _as_np(edge_index)
    both = np.concatenate([ei, ei[::-1]], axis=1)
    w = (
        None
        if edge_weight is None
        else np.concatenate([np.asarray(edge_weight)] * 2)
    )
    return coalesce(both, w, num_nodes=num_nodes, reduce="max")


def degree(
    edge_index, num_nodes: Optional[int] = None, edge_weight=None, kind: str = "in"
) -> np.ndarray:
    ei = _as_np(edge_index)
    if num_nodes is None:
        num_nodes = int(ei.max()) + 1 if ei.size else 0
    nodes = ei[1] if kind == "in" else ei[0]
    from gnn_tpu import native

    w = None if edge_weight is None else np.asarray(edge_weight, np.float32)
    return native.degrees(nodes, num_nodes, w)


def gcn_norm(
    edge_index,
    edge_weight=None,
    num_nodes: Optional[int] = None,
    *,
    self_loops: bool = True,
    improved: bool = False,
    norm: str = "sym",
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact GCN normalization: returns (edge_index', per-edge weight).

    sym: w_ij = d_i^-1/2 * a_ij * d_j^-1/2 over A(+I); row ("rw"):
    w_ij = d_i^-1 * a_ij. (Replaces the reference's post-hoc scalar
    approximation, src/graph.cpp:178-185.)
    """
    ei = _as_np(edge_index)
    if num_nodes is None:
        num_nodes = int(ei.max()) + 1 if ei.size else 0
    if self_loops:
        fill = 2.0 if improved else 1.0
        ei, edge_weight = add_remaining_self_loops(
            ei,
            edge_weight if edge_weight is not None else np.ones(ei.shape[1]),
            fill_value=fill,
            num_nodes=num_nodes,
        )
    w = np.ones(ei.shape[1]) if edge_weight is None else np.asarray(edge_weight, np.float64)
    deg = degree(ei, num_nodes, w, kind="in")
    if norm == "sym":
        with np.errstate(divide="ignore"):
            dinv = np.where(deg > 0, deg**-0.5, 0.0)
        w = dinv[ei[1]] * w * dinv[ei[0]]
    elif norm in ("rw", "row"):
        with np.errstate(divide="ignore"):
            dinv = np.where(deg > 0, 1.0 / deg, 0.0)
        w = dinv[ei[1]] * w
    elif norm in (None, "none"):
        pass
    else:
        raise ValueError(f"unknown norm '{norm}'")
    return ei, w.astype(np.float32)
