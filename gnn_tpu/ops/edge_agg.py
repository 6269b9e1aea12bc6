"""Gather-rate edge aggregation: per-node sums of per-EDGE message rows.

The dynamic-weight aggregation (attention numerators, softmax denominators,
edge-gather backward reductions) was served by the one-hot-matmul Pallas
kernel (ops/pallas/segment.py) — correct, but it burns R x C x F MACs per
C-edge chunk for C x F useful work: measured ~32 ms for the [E, 256] GAT
numerator at arxiv scale, ~10x off the chip's gather rate (docs/PERF.md
round 4). This module aggregates the SAME quantity at the gather rate by
reusing the sorted-ELL playbook (graphs/sorted_ell.py) one level up: slots
index EDGE POSITIONS of the canonical dst-sorted message array instead of
source-node rows of x.

    out[n] = sum over n's in-edges e of msg[e]

Per node the in-edges are one contiguous run of the sorted edge array, so
the layout is a degree-bucketed slot table over positions:

* nodes bucketed by in-degree into the measured width set {1..16, 8m}
  (+3.9% padding on the arxiv power-law benchmark, no width search);
* narrow buckets (K <= 16) are unrolled flat-gather chains — the measured
  fastest gather expression (~2.1-2.5 ns/row, the hardware's issue-rate
  wall); wide buckets decompose into width-8 subrows sharing one stream
  table; hubs (deg > 512) ride full-width pieces + one tiny scatter-add;
* bucket outputs are contiguous in an internal degree-sorted row order;
  ONE [N]-row combine gather maps rows back to node order (~0.4 ms at
  arxiv scale — unlike sorted-ELL, the node order here is the caller's,
  so the combine cannot be renumbered away);
* the VJP is a single [E]-row gather (d_msg[e] = g[node(e)]) — no scatter
  in either direction, and the whole path is plain XLA (runs identically
  on CPU, no interpret-mode divergence).

A TRANSPOSE layout (aggregate the same canonical-order array by SOURCE
node — the backward of a src gather) folds the dst->src permutation into
the slot positions, so the permute + reduce is one gather too.

Cost model at [E, F] f32: (E x (1 + padding)) slot-row gathers + N combine
rows at the flat gather rate — vs the kernel's R x C x F MACs. At F=256,
E=2.1M: ~6 ms predicted vs 32 ms measured for the kernel.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gnn_tpu.graphs.sorted_ell import (
    SUB,
    _bucket_key,
    _effective_kmax,
    _widths,
)
from gnn_tpu.nn.module import Module, static_field

__all__ = [
    "EdgeAggLayout",
    "AggBucket",
    "build_edge_agg",
    "edge_aggregate",
    "edge_aggregate_max",
    "WeightedAggLayout",
    "WAggBucket",
    "build_weighted_agg",
    "weighted_agg_matvec",
    "refresh_weighted_agg",
    "remap_weighted_agg",
]

NARROW_MAX = 16
KMAX = 512


class AggBucket(Module):
    """One fixed-width degree bucket: K slot positions per row."""

    slot: jax.Array  # [Nb, K] int32 edge positions (E = zero-padding row)
    k: int = static_field(default=1)


class EdgeAggLayout(Module):
    """See module docstring. Rows are in the internal degree-bucket order;
    ``inv_row`` maps caller node ids to rows (the combine gather)."""

    narrow: Tuple[AggBucket, ...]
    stream_slot: jax.Array  # [Q, SUB] int32 positions (wide + hub subrows)
    tail_row: jax.Array  # [T] int32 internal rows receiving hub-piece adds
    inv_row: jax.Array  # [N] int32 node id -> internal row
    edge_node: jax.Array  # [E] int32 aggregation node of each edge (VJP)
    wide_slices: tuple = static_field(default=())  # (row_off, sub_off, m, nb)
    tail_off: int = static_field(default=0)
    tail_m: int = static_field(default=0)
    n_zero: int = static_field(default=0)
    num_nodes: int = static_field(default=0)
    num_edges: int = static_field(default=0)

    @property
    def num_slots(self) -> int:
        s = sum(int(np.prod(b.slot.shape)) for b in self.narrow)
        return s + int(np.prod(self.stream_slot.shape))


def build_edge_agg(
    node_of_edge_sorted: np.ndarray,
    num_nodes: int,
    num_edges: int,
    *,
    positions: Optional[np.ndarray] = None,
    kmax: int = KMAX,
) -> EdgeAggLayout:
    """Host-side, structure-only.

    ``node_of_edge_sorted``: [E] the aggregation node of each edge, sorted
    ascending (e.g. ``adj.dst``). ``positions``: [E] the canonical edge
    position each sorted slot refers to — identity for the forward layout,
    ``adj.t_perm`` for the transpose layout (aggregation by src folds the
    permutation into the slots). ``num_edges`` is the canonical edge count
    (the msg array's length; padding slots point at row E)."""
    node = np.asarray(node_of_edge_sorted, np.int64)
    pos = (
        np.arange(len(node), dtype=np.int64)
        if positions is None
        else np.asarray(positions, np.int64)
    )
    deg = np.bincount(node, minlength=num_nodes)
    rp = np.concatenate([[0], np.cumsum(deg)])

    kmax = _effective_kmax(deg, kmax)
    widths = _widths(kmax)
    widths = widths[widths <= kmax]
    rem = deg % kmax
    full = deg // kmax
    bidx = _bucket_key(deg, kmax)
    order = np.argsort(bidx, kind="stable")  # internal row -> node id
    inv_row = np.empty(num_nodes, np.int64)
    inv_row[order] = np.arange(num_nodes)
    n_zero = int((bidx == -1).sum())

    def fill(sel: np.ndarray, K: int) -> np.ndarray:
        """Slot table [len(sel), K] of positions for the remainder edges of
        the selected nodes (their last ``rem`` edges; full-kmax pieces go to
        the hub tail)."""
        nb = len(sel)
        slot = np.full((nb, K), num_edges, np.int64)
        counts = rem[sel]
        tot = int(counts.sum())
        a = np.arange(tot)
        off = a - np.repeat(np.cumsum(counts) - counts, counts)
        rows = np.repeat(np.arange(nb), counts)
        flat = np.repeat(rp[sel] + full[sel] * kmax, counts) + off
        slot[rows, off] = pos[flat]
        return slot

    narrow = []
    wide_slots, wide_meta = [], []
    row_off = n_zero
    sub_off = 0
    for bi, K in enumerate(widths):
        # stable argsort keeps node-id order within a bucket, so ascending
        # node ids ARE the internal row order of this bucket
        sel = np.nonzero(bidx == bi)[0]
        if len(sel) == 0:
            continue
        slot = fill(sel, int(K))
        if K <= NARROW_MAX:
            narrow.append(
                AggBucket(slot=jnp.asarray(slot.astype(np.int32)), k=int(K))
            )
        else:
            m = int(K) // SUB
            wide_slots.append(slot.reshape(-1, SUB))
            wide_meta.append((row_off, sub_off, m, len(sel)))
            sub_off += len(sel) * m
        row_off += len(sel)
    assert row_off == num_nodes

    hubs = np.nonzero(full > 0)[0]
    T = int(full.sum())
    tail_row = inv_row[np.repeat(hubs, full[hubs])]
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
        wide_slots.append(pos[tidx].reshape(-1, SUB))
    tail_off = sub_off
    tail_m = kmax // SUB

    stream_slot = (
        np.concatenate(wide_slots, axis=0)
        if wide_slots
        else np.zeros((0, SUB), np.int64)
    )
    return EdgeAggLayout(
        narrow=tuple(narrow),
        stream_slot=jnp.asarray(stream_slot.astype(np.int32)),
        tail_row=jnp.asarray(tail_row.astype(np.int32)),
        inv_row=jnp.asarray(inv_row.astype(np.int32)),
        edge_node=jnp.asarray(node[np.argsort(pos, kind="stable")].astype(np.int32)),
        wide_slices=tuple(wide_meta),
        tail_off=int(tail_off),
        tail_m=int(tail_m),
        n_zero=n_zero,
        num_nodes=int(num_nodes),
        num_edges=int(num_edges),
    )


def _gather_sum(mp: jax.Array, slot2d: jax.Array) -> jax.Array:
    """sum_k mp[slot[:, k]] as a chain of <= 16 FLAT gathers (the measured
    fastest gather expression; see graphs/sorted_ell.py)."""
    acc = jnp.take(mp, slot2d[:, 0], axis=0)
    for k in range(1, slot2d.shape[1]):
        acc = acc + jnp.take(mp, slot2d[:, k], axis=0)
    return acc


def edge_aggregate(msg: jax.Array, lay: EdgeAggLayout) -> jax.Array:
    """out[n] = sum of msg rows whose aggregation node is n. msg: [E, F] in
    the canonical edge order the layout was built against. Scatter-free in
    both directions (VJP = one [E]-row gather)."""
    E, F = msg.shape
    if E != lay.num_edges:
        raise ValueError(f"layout built for {lay.num_edges} edges, got {E}")

    @jax.custom_vjp
    def agg(msg):
        mp = jnp.concatenate([msg, jnp.zeros((1, F), msg.dtype)])
        parts = [jnp.zeros((lay.n_zero, F), msg.dtype)]
        for b in lay.narrow:
            parts.append(_gather_sum(mp, b.slot))
        sliced = []
        if int(lay.stream_slot.shape[0]):
            sub = _gather_sum(mp, lay.stream_slot)
            for ro, so, m, nb in lay.wide_slices:
                sliced.append(
                    jnp.sum(sub[so : so + nb * m].reshape(nb, m, F), axis=1)
                )
        rows = jnp.concatenate(parts + sliced, axis=0)
        T = int(lay.tail_row.shape[0])
        if T:
            tails = jnp.sum(
                sub[lay.tail_off : lay.tail_off + T * lay.tail_m].reshape(
                    T, lay.tail_m, F
                ),
                axis=1,
            )
            rows = rows.at[lay.tail_row].add(tails)
        return jnp.take(rows, lay.inv_row, axis=0)

    def fwd(msg):
        return agg(msg), None

    def bwd(_, g):
        return (jnp.take(g, lay.edge_node, axis=0).astype(g.dtype),)

    agg.defvjp(fwd, bwd)
    return agg(msg)


class WAggBucket(Module):
    """One fixed-width bucket of the STATIC-WEIGHT variant: per slot a
    source COLUMN into x, a baked weight, and the canonical edge id (for
    weight re-baking; num_edges = padding)."""

    col: jax.Array  # [Nb, K] int32 source ids (padding: 0, weight 0)
    w: jax.Array  # [Nb, K] f32
    eid: jax.Array  # [Nb, K] int32
    k: int = static_field(default=1)


class WeightedAggLayout(Module):
    """Static-weight bucketed aggregation WITHOUT node renumbering: the
    sorted-ELL recipe (degree buckets, unrolled flat gathers, width-8
    wide streams, hub tail) in an internal degree-sorted row order, mapped
    back to the caller's node order by one [N]-row combine gather.

    Built for the blocked layout's inter-window remainder (graphs/
    blocked.py rem_backend='bucket'): slots gather x DIRECTLY at the
    small-node-table rate (~2.2 ns/row at F=128) instead of routing an
    [E_r, F] message array through the one-hot kernel (~5.3 ns/edge) —
    and the window order is fixed by the packing, so the sorted-ELL
    renumbering trick is unavailable and the combine gather (~0.4 ms at
    arxiv scale) is the price of bucket contiguity."""

    narrow: Tuple[WAggBucket, ...]
    stream_col: jax.Array  # [Q, SUB]
    stream_w: jax.Array
    stream_eid: jax.Array
    tail_row: jax.Array  # [T] internal rows receiving hub-piece adds
    inv_row: jax.Array  # [N] node id -> internal row (combine gather)
    wide_slices: tuple = static_field(default=())
    tail_off: int = static_field(default=0)
    tail_m: int = static_field(default=0)
    n_zero: int = static_field(default=0)
    num_nodes: int = static_field(default=0)
    num_edges: int = static_field(default=0)

    @property
    def num_slots(self) -> int:
        s = sum(int(np.prod(b.col.shape)) for b in self.narrow)
        return s + int(np.prod(self.stream_col.shape))


def build_weighted_agg(
    dst_sorted: np.ndarray,
    src: np.ndarray,
    edge_ids: np.ndarray,
    weight: Optional[np.ndarray],
    num_nodes: int,
    num_edges: int,
    *,
    kmax: int = KMAX,
) -> WeightedAggLayout:
    """Host-side build. ``dst_sorted`` ascending destination per edge;
    ``src``/``edge_ids`` aligned; ``weight`` indexed by edge POSITION
    (None = ones). ``num_edges`` is the canonical edge count for the eid
    padding sentinel."""
    dst = np.asarray(dst_sorted, np.int64)
    src = np.asarray(src, np.int64)
    eid = np.asarray(edge_ids, np.int64)
    w = (
        np.ones(len(dst), np.float32)
        if weight is None
        else np.asarray(weight, np.float32)
    )
    deg = np.bincount(dst, minlength=num_nodes)
    rp = np.concatenate([[0], np.cumsum(deg)])
    kmax = _effective_kmax(deg, kmax)
    widths = _widths(kmax)
    widths = widths[widths <= kmax]
    rem = deg % kmax
    full = deg // kmax
    bidx = _bucket_key(deg, kmax)
    order = np.argsort(bidx, kind="stable")
    inv_row = np.empty(num_nodes, np.int64)
    inv_row[order] = np.arange(num_nodes)
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
        colb[rows, off] = src[flat]
        wb[rows, off] = w[flat]
        eb[rows, off] = eid[flat]
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
                WAggBucket(
                    col=jnp.asarray(colb.astype(np.int32)),
                    w=jnp.asarray(wb),
                    eid=jnp.asarray(eb.astype(np.int32)),
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

    hubs = np.nonzero(full > 0)[0]
    T = int(full.sum())
    tail_row = inv_row[np.repeat(hubs, full[hubs])]
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
        wide_cols.append(src[tidx].reshape(-1, SUB))
        wide_ws.append(w[tidx].reshape(-1, SUB))
        wide_es.append(eid[tidx].reshape(-1, SUB))
    if wide_cols:
        stream_col = np.concatenate(wide_cols, axis=0)
        stream_w = np.concatenate(wide_ws, axis=0)
        stream_eid = np.concatenate(wide_es, axis=0)
    else:
        stream_col = np.zeros((0, SUB), np.int64)
        stream_w = np.zeros((0, SUB), np.float32)
        stream_eid = np.zeros((0, SUB), np.int64)
    return WeightedAggLayout(
        narrow=tuple(narrow),
        stream_col=jnp.asarray(stream_col.astype(np.int32)),
        stream_w=jnp.asarray(stream_w),
        stream_eid=jnp.asarray(stream_eid.astype(np.int32)),
        tail_row=jnp.asarray(tail_row.astype(np.int32)),
        inv_row=jnp.asarray(inv_row.astype(np.int32)),
        wide_slices=tuple(wide_meta),
        tail_off=int(sub_off),
        tail_m=kmax // SUB,
        n_zero=n_zero,
        num_nodes=int(num_nodes),
        num_edges=int(num_edges),
    )


def _gather_wsum(x: jax.Array, col2d: jax.Array, w2d: jax.Array) -> jax.Array:
    acc = w2d[:, 0, None] * jnp.take(x, col2d[:, 0], axis=0)
    for k in range(1, col2d.shape[1]):
        acc = acc + w2d[:, k, None] * jnp.take(x, col2d[:, k], axis=0)
    return acc


def weighted_agg_matvec(x: jax.Array, lay: WeightedAggLayout) -> jax.Array:
    """out[n] = sum over n's slots of w_slot * x[col_slot], in the
    caller's node order (one combine gather). Forward-only — backward is
    the caller's transpose layout (graphs/blocked.py convention)."""
    F = x.shape[1]
    parts = [jnp.zeros((lay.n_zero, F), jnp.float32)]
    for b in lay.narrow:
        parts.append(_gather_wsum(x, b.col, b.w))
    sliced = []
    if int(lay.stream_col.shape[0]):
        sub = _gather_wsum(x, lay.stream_col, lay.stream_w)
        for ro, so, m, nb in lay.wide_slices:
            sliced.append(
                jnp.sum(sub[so : so + nb * m].reshape(nb, m, F), axis=1)
            )
    rows = jnp.concatenate(parts + sliced, axis=0)
    T = int(lay.tail_row.shape[0])
    if T:
        tails = jnp.sum(
            sub[lay.tail_off : lay.tail_off + T * lay.tail_m].reshape(
                T, lay.tail_m, F
            ),
            axis=1,
        )
        rows = rows.at[lay.tail_row].add(tails)
    return jnp.take(rows, lay.inv_row, axis=0).astype(x.dtype)


def refresh_weighted_agg(
    lay: WeightedAggLayout, w_ext: jax.Array
) -> WeightedAggLayout:
    """Re-bake slot weights from an extended weight vector (w_ext[E] + a
    trailing 0 for the padding sentinel)."""
    return lay.replace(
        narrow=tuple(b.replace(w=jnp.take(w_ext, b.eid)) for b in lay.narrow),
        stream_w=jnp.take(w_ext, lay.stream_eid),
    )


def remap_weighted_agg(lay, inv_ext: jax.Array):
    """Remap canonical edge ids through a transpose permutation (see
    Adjacency.transpose)."""
    if lay is None:
        return None
    return lay.replace(
        narrow=tuple(b.replace(eid=inv_ext[b.eid]) for b in lay.narrow),
        stream_eid=inv_ext[lay.stream_eid],
    )


def _gather_max(mp: jax.Array, slot2d: jax.Array) -> jax.Array:
    acc = jnp.take(mp, slot2d[:, 0], axis=0)
    for k in range(1, slot2d.shape[1]):
        acc = jnp.maximum(acc, jnp.take(mp, slot2d[:, k], axis=0))
    return acc


def edge_aggregate_max(msg: jax.Array, lay: EdgeAggLayout) -> jax.Array:
    """out[n] = max of msg rows whose aggregation node is n (-inf where a
    node has none) — the segment-max at the gather rate, replacing XLA's
    scatter-max (same physics as the sum: never scatter). NOT
    differentiable (no VJP): intended for stop-gradient uses like the
    softmax stabilization shift."""
    E, F = msg.shape
    if E != lay.num_edges:
        raise ValueError(f"layout built for {lay.num_edges} edges, got {E}")
    neg = -jnp.inf  # segment_max parity: empty segments -> -inf
    mp = jnp.concatenate([msg, jnp.full((1, F), neg, msg.dtype)])
    parts = [jnp.full((lay.n_zero, F), neg, msg.dtype)]
    for b in lay.narrow:
        parts.append(_gather_max(mp, b.slot))
    sliced = []
    if int(lay.stream_slot.shape[0]):
        sub = _gather_max(mp, lay.stream_slot)
        for ro, so, m, nb in lay.wide_slices:
            sliced.append(
                jnp.max(sub[so : so + nb * m].reshape(nb, m, F), axis=1)
            )
    rows = jnp.concatenate(parts + sliced, axis=0)
    T = int(lay.tail_row.shape[0])
    if T:
        tails = jnp.max(
            sub[lay.tail_off : lay.tail_off + T * lay.tail_m].reshape(
                T, lay.tail_m, F
            ),
            axis=1,
        )
        rows = rows.at[lay.tail_row].max(tails)
    return jnp.take(rows, lay.inv_row, axis=0)
