"""Contiguous degree-bucket ELL: the combine-free single-chip SpMM layout.

The generic ELL layout (graphs/ell.py) pays a per-node "combine" after the
per-bucket reductions: a permutation gather (plus a second one for 2-piece
covers) that reassembles bucket-ordered part rows into node order. On-chip
decomposition of the benchmark step showed that combine costing ~34% of the
matvec (the gathers don't fuse; ~1.0-1.4 ms each per pass at arxiv scale).

This layout removes the combine entirely by RENUMBERING NODES so every
bucket's rows land contiguously in node order: the matvec output is just
``concatenate(bucket_parts)``. GNNs are permutation-equivariant, so the
relabeling is exact — callers feed features in the reordered space (see
``Adjacency.perm``). This is the TPU answer to the reference's aggregation
``adj.mm(x)`` (reference: src/graph.cpp:204-212): one data layout decision
replaces scatter machinery.

Three more measured-on-chip design rules are baked in:

* **Unrolled flat gathers.** ``x[col[:, k]]`` with a 1-D index vector,
  accumulated over k, runs at the chip's flat-gather rate (~2.1 ns/row);
  XLA's emitter for a single batched ``x[col]`` gather with a [Nb, K] index
  is measurably slower. The unroll-chain fusion falls off a ~2.2x cliff
  beyond ~16 gather operands, so:
* **Narrow buckets (width 1..16)** are direct unrolled chains, and
* **wide buckets (width 8m, m >= 3)** are decomposed into width-8 subrows
  sharing ONE stream table: 8 big unrolled gathers produce a subrow
  accumulator that per-bucket reshape-sums reduce (a real consumer, so no
  optimization_barrier games — those measured catastrophic).
* **Self-loops fold into a fused diagonal** term ``diag_w[:, None] * x``
  (6.8% of edges on the GCN-normalized benchmark graph, at ~zero cost), and
  **hub overflow** (degree > kmax) rides the stream as full-width pieces
  added back through one tiny scatter-add (measured +0.04 ns/slot).

Fixed width set {1..16} + {8m} pads the arxiv-scale power-law workload by
+3.9% (vs +28% for 10 power-of-two buckets) with no width search needed.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gnn_tpu.nn.module import Module, static_field

__all__ = [
    "SortedEllLayout",
    "NarrowBlock",
    "degree_bucket_order",
    "build_sorted_ell",
    "sorted_ell_matvec",
    "sorted_ell_edge_grad",
]

NARROW_MAX = 16
SUB = 8  # subrow width of the wide-bucket stream
KMAX = 512


def _widths(kmax: int = KMAX) -> np.ndarray:
    return np.asarray(
        sorted(set(range(1, NARROW_MAX + 1)) | {SUB * m for m in range(3, kmax // SUB + 1)}),
        np.int64,
    )


def _effective_kmax(deg_nonself: np.ndarray, kmax: int = KMAX) -> int:
    """kmax shrunk to the largest degree (never below the smallest wide
    width). Shared by the order and the builder so bucket keys agree even
    when a node's degree equals the shrunk kmax exactly."""
    widths = _widths(kmax)
    k = int(
        min(kmax, max(int(deg_nonself.max()) if len(deg_nonself) else 1, 3 * SUB))
    )
    return int(widths[np.searchsorted(widths, k)])


def _bucket_key(deg_nonself: np.ndarray, kmax: int) -> np.ndarray:
    """Bucket index per node: -1 for remainder-0 (zero-row) nodes, else the
    index of the smallest layout width >= (deg mod kmax)."""
    widths = _widths(kmax)
    rem = np.asarray(deg_nonself, np.int64) % kmax
    return np.where(rem == 0, -1, np.searchsorted(widths, rem))


def degree_bucket_order(deg_nonself: np.ndarray, kmax: int = KMAX) -> np.ndarray:
    """Node permutation (new -> old) grouping nodes by remainder bucket.

    Stable, so relative order within a bucket is preserved. Nodes whose
    non-self degree is an exact multiple of the effective kmax (including
    isolated nodes) lead the order as the zeros block."""
    deg_nonself = np.asarray(deg_nonself, np.int64)
    return np.argsort(
        _bucket_key(deg_nonself, _effective_kmax(deg_nonself, kmax)),
        kind="stable",
    )


class NarrowBlock(Module):
    """One fixed-width narrow bucket (K <= NARROW_MAX), rows in node order."""

    col: jax.Array  # [Nb, K] int32 source ids (padding: 0, weight 0)
    w: jax.Array  # [Nb, K] f32 baked slot weights
    slot_to_edge: jax.Array  # [Nb, K] int32 canonical edge id (E = padding)
    k: int = static_field(default=1)


class SortedEllLayout(Module):
    """See module docstring. All node/row indices are in the REORDERED space."""

    narrow: Tuple[NarrowBlock, ...]
    stream_col: jax.Array  # [Q, SUB] int32
    stream_w: jax.Array  # [Q, SUB] f32
    stream_edge: jax.Array  # [Q, SUB] int32 canonical edge ids (E = padding)
    stream_node: jax.Array  # [Q] int32 destination node of each subrow
    tail_node: jax.Array  # [T] int32 hub nodes receiving tail adds
    diag_w: jax.Array  # [N] f32 baked self-loop weights
    diag_edge: jax.Array  # [N] int32 self-edge id per node (E = none)
    edge_to_slot: jax.Array  # [E] int32 into the flat slot space
    # static structure: ((row_offset, subrow_offset, m, nb), ...) per wide
    # bucket — rows [row_offset, row_offset+nb) of the output come from
    # subrows [subrow_offset, subrow_offset + nb*m) reduced m-to-1.
    wide_slices: tuple = static_field(default=())
    tail_off: int = static_field(default=0)  # first tail subrow in the stream
    tail_m: int = static_field(default=0)  # subrows per tail piece (kmax//SUB)
    n_zero: int = static_field(default=0)  # leading zero-row count
    num_nodes: int = static_field(default=0)
    num_edges: int = static_field(default=0)
    kmax: int = static_field(default=KMAX)
    # Hub-dense MXU block (hot_threshold): sources gathered >= threshold
    # times have their edges moved out of the slot tables into a dense
    # [N, H] matrix — out += dense_w @ x[hot_ids] rides the MXU at ~zero
    # marginal cost per absorbed edge. Static-weight layouts only.
    hot_ids: Optional[jax.Array] = None  # [H] int32 hot source ids
    dense_w: Optional[jax.Array] = None  # [N, H] hot_dtype
    dense_eid: Optional[jax.Array] = None  # [n_hot_edges] canonical edge id
    dense_pos: Optional[jax.Array] = None  # [n_hot_edges] flat N*H position

    @property
    def num_slots(self) -> int:
        s = sum(int(np.prod(b.col.shape)) for b in self.narrow)
        return s + int(np.prod(self.stream_col.shape))


def build_sorted_ell(
    row_ptr: np.ndarray,
    col_of_edge: np.ndarray,
    edge_ids: np.ndarray,
    num_nodes: int,
    num_edges: int,
    *,
    edge_weight: Optional[np.ndarray] = None,
    kmax: int = KMAX,
    hot_ids: Optional[np.ndarray] = None,
    hot_dtype=None,
) -> SortedEllLayout:
    """Build the layout from a dst-CSR over ALREADY degree-bucket-ordered
    node ids (``degree_bucket_order``). ``col_of_edge``/``edge_ids`` are the
    per-edge source id and canonical edge id in dst-sorted order. Self-loops
    (col == row) are extracted into the diagonal. Raises if the required
    bucket contiguity does not hold (i.e. nodes were not reordered).

    ``hot_ids``: source nodes whose (non-self) edges move into the hub-dense
    MXU block instead of slot tables — the node ORDER must then come from
    the cold degrees (``build_adjacency(hub_dense=...)`` keeps this
    consistent). ``hot_dtype`` (default f32; bf16 halves the dense read at
    ~0.4% weight rounding) is the dense block's storage dtype."""
    row_ptr = np.asarray(row_ptr, np.int64)
    col = np.asarray(col_of_edge, np.int64)
    eid = np.asarray(edge_ids, np.int64)
    w = (
        np.ones(num_edges, np.float32)
        if edge_weight is None
        else np.asarray(edge_weight, np.float32)
    )[eid] if num_edges else np.zeros(0, np.float32)
    deg = np.diff(row_ptr)
    dst = np.repeat(np.arange(num_nodes), deg)

    diag_w = np.zeros(num_nodes, np.float32)
    diag_edge = np.full(num_nodes, num_edges, np.int64)
    is_diag = col == dst
    if is_diag.any() and (np.bincount(dst[is_diag], minlength=num_nodes) > 1).any():
        raise ValueError(
            "build_sorted_ell: multiple self-loops on one node; coalesce the "
            "edge list first (graphs.coalesce)"
        )
    np.add.at(diag_w, dst[is_diag], w[is_diag])
    diag_edge[dst[is_diag]] = eid[is_diag]

    keep = ~is_diag
    col_k, eid_k, w_k, dst_k = col[keep], eid[keep], w[keep], dst[keep]

    # hub-dense split: hot-source edges leave the slot tables for D [N, H]
    hot_arrs = (None, None, None, None)
    if hot_ids is not None and len(hot_ids):
        hot_ids = np.asarray(hot_ids, np.int64)
        H = len(hot_ids)
        hot_rank = np.full(num_nodes, -1, np.int64)
        hot_rank[hot_ids] = np.arange(H)
        hmask = hot_rank[col_k] >= 0
        if hmask.any():
            dpos = dst_k[hmask] * H + hot_rank[col_k[hmask]]
            D = np.zeros(num_nodes * H, np.float32)
            np.add.at(D, dpos, w_k[hmask])
            hot_arrs = (
                jnp.asarray(hot_ids.astype(np.int32)),
                jnp.asarray(D.reshape(num_nodes, H)).astype(
                    jnp.float32 if hot_dtype is None else hot_dtype
                ),
                jnp.asarray(eid_k[hmask].astype(np.int32)),
                jnp.asarray(dpos.astype(np.int64)),
            )
            col_k, eid_k, w_k, dst_k = (
                col_k[~hmask], eid_k[~hmask], w_k[~hmask], dst_k[~hmask]
            )
    deg_ns = np.bincount(dst_k, minlength=num_nodes)
    rp = np.concatenate([[0], np.cumsum(deg_ns)])

    kmax = _effective_kmax(deg_ns, kmax)
    widths = _widths(kmax)
    widths = widths[widths <= kmax]
    rem = deg_ns % kmax
    full = deg_ns // kmax
    bidx = np.where(rem == 0, -1, np.searchsorted(widths, rem))
    # contiguity check: bucket key must be non-decreasing over node ids
    if num_nodes and (np.diff(bidx) < 0).any():
        raise ValueError(
            "build_sorted_ell requires nodes ordered by degree bucket "
            "(degree_bucket_order); found a bucket inversion"
        )
    n_zero = int((bidx == -1).sum())

    def fill(sel: np.ndarray, K: int):
        nb = len(sel)
        colb = np.zeros((nb, K), np.int64)
        wb = np.zeros((nb, K), np.float32)
        eb = np.full((nb, K), num_edges, np.int64)
        counts = rem[sel]
        tot = int(counts.sum())
        a = np.arange(tot)
        off = a - np.repeat(np.cumsum(counts) - counts, counts)
        rows = np.repeat(np.arange(nb), counts)
        flat = np.repeat(rp[sel] + full[sel] * kmax, counts) + off
        colb[rows, off] = col_k[flat]
        wb[rows, off] = w_k[flat]
        eb[rows, off] = eid_k[flat]
        return colb, wb, eb

    narrow = []
    wide_cols, wide_ws, wide_es, wide_meta = [], [], [], []
    row_off = n_zero
    sub_off = 0
    for bi, K in enumerate(widths):
        sel = np.nonzero(bidx == bi)[0]
        if len(sel) == 0:
            continue
        colb, wb, eb = fill(sel, int(K))
        if K <= NARROW_MAX:
            narrow.append(
                NarrowBlock(
                    col=jnp.asarray(colb.astype(np.int32)),
                    w=jnp.asarray(wb),
                    slot_to_edge=jnp.asarray(eb.astype(np.int32)),
                    k=int(K),
                )
            )
        else:
            m = int(K) // SUB
            wide_cols.append(colb.reshape(-1, SUB))
            wide_ws.append(wb.reshape(-1, SUB))
            wide_es.append(eb.reshape(-1, SUB))
            wide_meta.append((row_off, sub_off, m, len(sel)))
            sub_off += len(sel) * m
        row_off += len(sel)
    assert row_off == num_nodes

    # hub tail: full-kmax pieces as stream subrows, added back by scatter
    hubs = np.nonzero(full > 0)[0]
    T = int(full.sum())
    tail_node = np.repeat(hubs, full[hubs])
    if T:
        starts = (
            np.repeat(rp[hubs], full[hubs])
            + (
                np.arange(T)
                - np.repeat(np.cumsum(full[hubs]) - full[hubs], full[hubs])
            )
            * kmax
        )
        tidx = starts[:, None] + np.arange(kmax)[None, :]
        wide_cols.append(col_k[tidx].reshape(-1, SUB))
        wide_ws.append(w_k[tidx].reshape(-1, SUB))
        wide_es.append(eid_k[tidx].reshape(-1, SUB))
    tail_off = sub_off
    tail_m = kmax // SUB

    if wide_cols:
        stream_col = np.concatenate(wide_cols, axis=0)
        stream_w = np.concatenate(wide_ws, axis=0)
        stream_edge = np.concatenate(wide_es, axis=0)
    else:
        stream_col = np.zeros((0, SUB), np.int64)
        stream_w = np.zeros((0, SUB), np.float32)
        stream_edge = np.zeros((0, SUB), np.int64)
    stream_node = np.zeros(len(stream_col), np.int64)
    for ro, so, m, nb in wide_meta:
        stream_node[so : so + nb * m] = ro + np.repeat(np.arange(nb), m)
    if T:
        stream_node[tail_off:] = np.repeat(tail_node, tail_m)

    # canonical-edge -> flat-slot map (narrow blocks, stream, then diagonal)
    edge_to_slot = np.full(num_edges, 0, np.int64)
    off = 0
    for b in narrow:
        eb = np.asarray(b.slot_to_edge)
        real = eb != num_edges
        edge_to_slot[eb[real]] = off + np.nonzero(real.ravel())[0]
        off += eb.size
    real = stream_edge != num_edges
    edge_to_slot[stream_edge[real]] = off + np.nonzero(real.ravel())[0]
    off += stream_edge.size
    has_diag = diag_edge < num_edges
    edge_to_slot[diag_edge[has_diag]] = off + np.nonzero(has_diag)[0]

    return SortedEllLayout(
        narrow=tuple(narrow),
        stream_col=jnp.asarray(stream_col.astype(np.int32)),
        stream_w=jnp.asarray(stream_w),
        stream_edge=jnp.asarray(stream_edge.astype(np.int32)),
        stream_node=jnp.asarray(stream_node.astype(np.int32)),
        tail_node=jnp.asarray(tail_node.astype(np.int32)),
        diag_w=jnp.asarray(diag_w),
        diag_edge=jnp.asarray(diag_edge.astype(np.int32)),
        edge_to_slot=jnp.asarray(edge_to_slot.astype(np.int32)),
        wide_slices=tuple(wide_meta),
        tail_off=int(tail_off),
        tail_m=int(tail_m),
        n_zero=n_zero,
        num_nodes=int(num_nodes),
        num_edges=int(num_edges),
        kmax=int(kmax),
        hot_ids=hot_arrs[0],
        dense_w=hot_arrs[1],
        dense_eid=hot_arrs[2],
        dense_pos=hot_arrs[3],
    )


def refresh_sorted_weights(
    lay: SortedEllLayout, weight: Optional[jax.Array], num_edges: int
) -> SortedEllLayout:
    """Re-bake slot/diagonal weights after an edge-weight swap (layout
    constants — not a grad path; use the dynamic-weight matvec for that)."""
    if weight is None:
        w_ext = jnp.concatenate(
            [jnp.ones((num_edges,), jnp.float32), jnp.zeros((1,), jnp.float32)]
        )
    else:
        w_ext = jax.lax.stop_gradient(
            jnp.concatenate(
                [weight.astype(jnp.float32), jnp.zeros((1,), jnp.float32)]
            )
        )
    changes = dict(
        narrow=tuple(
            b.replace(w=jnp.take(w_ext, b.slot_to_edge)) for b in lay.narrow
        ),
        stream_w=jnp.take(w_ext, lay.stream_edge),
        diag_w=jnp.where(
            lay.diag_edge < num_edges,
            jnp.take(w_ext, jnp.minimum(lay.diag_edge, num_edges)),
            0.0,
        ),
    )
    if lay.dense_w is not None:
        H = lay.dense_w.shape[1]
        D = jnp.zeros((lay.num_nodes * H,), jnp.float32)
        D = D.at[lay.dense_pos].add(jnp.take(w_ext, lay.dense_eid))
        changes["dense_w"] = D.reshape(lay.num_nodes, H).astype(
            lay.dense_w.dtype
        )
    return lay.replace(**changes)


def _unrolled(x, col2d, w2d):
    """Sum_k w[:, k] * x[col[:, k]] as a chain of FLAT gathers (<= 16)."""
    acc = w2d[:, 0, None] * jnp.take(x, col2d[:, 0], axis=0)
    for k in range(1, col2d.shape[1]):
        acc = acc + w2d[:, k, None] * jnp.take(x, col2d[:, k], axis=0)
    return acc


def sorted_ell_matvec(
    lay: SortedEllLayout, x: jax.Array, weight: Optional[jax.Array] = None
) -> jax.Array:
    """out[n] = sum over n's slots of w_slot * x[col_slot], plus the fused
    diagonal. ``weight=None`` uses the baked layout weights; a per-edge
    ``weight`` (canonical dst-sorted edge order) re-gathers slot weights for
    the differentiable-attention path."""
    F = x.shape[1]
    if weight is not None:
        if lay.dense_w is not None:
            raise ValueError(
                "dynamic per-edge weights are not supported on a hub-dense "
                "layout (the dense block's weights are baked); build the "
                "adjacency with hub_dense=None for attention layers"
            )
        w_ext = jnp.concatenate(
            [weight.astype(jnp.float32), jnp.zeros((1,), jnp.float32)]
        )
    parts = [jnp.zeros((lay.n_zero, F), x.dtype)]
    sliced = []  # wide parts to interleave by row offset
    for b in lay.narrow:
        wb = b.w if weight is None else jnp.take(w_ext, b.slot_to_edge)
        parts.append(_unrolled(x, b.col, wb).astype(x.dtype))
    if int(lay.stream_col.shape[0]):
        ws = (
            lay.stream_w
            if weight is None
            else jnp.take(w_ext, lay.stream_edge)
        )
        sub = _unrolled(x, lay.stream_col, ws).astype(x.dtype)
        for ro, so, m, nb in lay.wide_slices:
            sliced.append(jnp.sum(sub[so : so + nb * m].reshape(nb, m, F), axis=1))
    out = jnp.concatenate(parts + sliced, axis=0)
    dw = lay.diag_w if weight is None else jnp.take(w_ext, lay.diag_edge)
    out = out + dw[:, None].astype(x.dtype) * x
    if lay.dense_w is not None:
        # hub-dense: MXU matmul against the hot sources' feature rows
        xh = jnp.take(x, lay.hot_ids, axis=0).astype(lay.dense_w.dtype)
        out = out + jnp.dot(
            lay.dense_w, xh, preferred_element_type=jnp.float32
        ).astype(x.dtype)
    T = int(lay.tail_node.shape[0])
    if T:
        tails = jnp.sum(
            sub[lay.tail_off : lay.tail_off + T * lay.tail_m].reshape(
                T, lay.tail_m, F
            ),
            axis=1,
        )
        out = out.at[lay.tail_node].add(tails)
    return out


def sorted_ell_edge_grad(
    lay: SortedEllLayout, g_out: jax.Array, x: jax.Array
) -> jax.Array:
    """dw_e = <g[dst_e], x[src_e]> (an SDDMM) over the sorted layout, mapped
    back to canonical edge order by one gather — never a scatter."""
    if lay.dense_w is not None:
        raise ValueError(
            "edge gradients are not supported on a hub-dense layout; build "
            "the adjacency with hub_dense=None for differentiable weights"
        )
    flats = []
    row = lay.n_zero
    for b in lay.narrow:
        nb = int(b.col.shape[0])
        g_rows = g_out[row : row + nb]
        xg = jnp.take(x, b.col, axis=0)  # [Nb, K, F]
        flats.append(
            jnp.einsum(
                "nf,nkf->nk", g_rows, xg, preferred_element_type=jnp.float32
            ).reshape(-1)
        )
        row += nb
    if int(lay.stream_col.shape[0]):
        g_sub = jnp.take(g_out, lay.stream_node, axis=0)  # [Q, F]
        xs = jnp.take(x, lay.stream_col, axis=0)  # [Q, SUB, F]
        flats.append(
            jnp.einsum(
                "qf,qsf->qs", g_sub, xs, preferred_element_type=jnp.float32
            ).reshape(-1)
        )
    # diagonal slots
    flats.append(
        jnp.sum(g_out * x, axis=-1, dtype=jnp.float32)
    )
    flat = jnp.concatenate(flats)
    return jnp.take(flat, lay.edge_to_slot)
