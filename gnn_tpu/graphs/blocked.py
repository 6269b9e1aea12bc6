"""Cluster-packed block-diagonal SpMM layout: aggregation on the MXU.

Measured physics (benchmarks/locality_rate.py, docs/PERF.md): XLA's random
row gather runs at a flat ~2.2-4 ns/row *regardless of index locality* — it
is an issue-rate wall, not a bandwidth one, so clustered node orders buy
nothing through the gather unit. The only way past the wall is to stop
gathering: after a community-aware node relabeling, intra-community edges
form dense diagonal blocks, and a [B, R, R] x [B, R, F] batched matmul
aggregates them on the MXU at memory speed (reading the block values
sequentially at full HBM bandwidth) — per-edge cost R*R*bytes/nnz_block,
~5-30x under the gather wall for real community densities. Only the
inter-community remainder still pays per-edge gathers.

This replaces what the reference does with a FULL dense N x N adjacency
matmul per layer (reference: src/graph.cpp:204-212): keep the dense-matmul
idea exactly where the graph is locally dense, and be sparse everywhere
else.

Pipeline (host, one-time):

1. communities <- size-capped label propagation (native C++ graph-core,
   ``gnn_tpu.native.label_propagation``; cap = R so every community fits a
   window);
2. node order <- first-fit-decreasing packing of communities into windows
   of exactly R nodes (underfull bins concatenated and cut at R, splitting
   the straddler — see :func:`cluster_pack_order`);
3. edges with src-window == dst-window are baked into ``diag [B, R, R]``
   (including self-loops); the remainder stays COO (dst-sorted) and rides
   the Pallas one-hot segment-sum kernel (ops/pallas/segment.py).

Like the hub-dense block of graphs/sorted_ell.py this is a STATIC-weight
layout (frozen GCN norms); dynamic per-edge weights (attention) need a
non-blocked adjacency.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gnn_tpu.nn.module import Module, static_field

__all__ = [
    "BlockedLayout",
    "cluster_order",
    "cluster_pack_order",
    "build_blocked",
    "blocked_matvec",
]

DEFAULT_R = 256  # window rows: one [R, R] f32 block = R*R*4 B; MXU-aligned


class BlockedLayout(Module):
    """Block-diagonal dense + COO remainder, in the packed node order."""

    diag: jax.Array  # [B, R, R] block values; diag[b, r, c] = w(edge
    # src = b*R+c -> dst = b*R+r), 0 where no edge
    diag_pos: jax.Array  # [E_d] int64 flat B*R*R position per dense edge
    diag_eid: jax.Array  # [E_d] int32 canonical edge id per dense edge
    rem_src: jax.Array  # [E_r] int32 remainder sources (packed ids)
    rem_dst: jax.Array  # [E_r] int32 remainder destinations, ascending
    rem_w: Optional[jax.Array]  # [E_r] f32 or None (= ones)
    rem_eid: jax.Array  # [E_r] int32 canonical edge ids
    rem_plan: object  # ops.pallas.segment.ChunkPlan over rem_dst
    num_nodes: int = static_field(default=0)
    rows: int = static_field(default=DEFAULT_R)

    @property
    def num_blocks(self) -> int:
        return int(self.diag.shape[0])

    @property
    def num_dense_edges(self) -> int:
        return int(self.diag_eid.shape[0])

    @property
    def num_rem_edges(self) -> int:
        return int(self.rem_src.shape[0])


def cluster_order(
    edge_index,
    num_nodes: int,
    *,
    max_size: int = 0,
    n_iters: int = 10,
    seed: int = 0,
) -> np.ndarray:
    """Node permutation (new -> old) grouping nodes by discovered community
    (label propagation, native graph-core), communities in node-id order.

    The locality primitive behind both fast paths: feed it to
    ``build_adjacency(reorder='cluster')`` windows (done internally there)
    or apply it BEFORE ``partition_graph`` so the contiguous node-range
    partition cuts between communities instead of through them — the halo
    (and hence all_to_all bytes) shrinks toward the graph's inter-community
    edge fraction (docs/SCALING.md's second table)."""
    from gnn_tpu import native

    ei = np.asarray(edge_index)
    order0, rp0 = native.sort_edges_csr(ei[0], ei[1], num_nodes)
    labels, _ = native.label_propagation(
        rp0,
        ei[0].astype(np.int64)[order0],
        max_size=max_size,
        n_iters=n_iters,
        seed=seed,
    )
    return np.argsort(labels, kind="stable")


def cluster_pack_order(labels: np.ndarray, rows: int) -> np.ndarray:
    """Node permutation (new -> old) packing communities into windows of
    exactly ``rows`` nodes.

    First-fit-decreasing bin packing of the label groups (communities
    larger than a window are pre-chopped into window-size chunks); bins
    that end underfull are concatenated and cut at window boundaries, so
    every window boundary splits at most one community. Deterministic for
    a given labeling."""
    labels = np.asarray(labels, np.int64)
    n = len(labels)
    order_by_label = np.argsort(labels, kind="stable")
    counts = np.bincount(labels) if n else np.zeros(0, np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)])
    # chunks: (start offset into order_by_label, size), communities chopped
    chunks = []
    for c in range(len(counts)):
        s, size = int(starts[c]), int(counts[c])
        while size > rows:
            chunks.append((s, rows))
            s += rows
            size -= rows
        if size:
            chunks.append((s, size))
    # FFD: place big chunks first; small ones plug the gaps.
    chunks.sort(key=lambda t: -t[1])
    bins: list[list[Tuple[int, int]]] = []
    space: list[int] = []
    for ch in chunks:
        placed = False
        for i in range(len(bins)):
            if space[i] >= ch[1]:
                bins[i].append(ch)
                space[i] -= ch[1]
                placed = True
                break
        if not placed:
            bins.append([ch])
            space.append(rows - ch[1])
    # Full bins first (aligned as-is); underfull bins concatenated and cut
    # at `rows` — the straddling community is split once per boundary.
    full = [b for b, sp in zip(bins, space) if sp == 0]
    part = [b for b, sp in zip(bins, space) if sp != 0]
    perm = np.empty(n, np.int64)
    off = 0
    for b in full + part:
        for s, size in b:
            perm[off : off + size] = order_by_label[s : s + size]
            off += size
    assert off == n
    return perm


def build_blocked(
    src: np.ndarray,
    dst: np.ndarray,
    edge_ids: np.ndarray,
    num_nodes: int,
    num_edges: int,
    *,
    edge_weight: Optional[np.ndarray] = None,
    rows: int = DEFAULT_R,
    block_dtype=None,
) -> BlockedLayout:
    """Build from PACKED-id edges in dst-sorted order. ``edge_ids`` are the
    canonical (adjacency-order) edge ids of each input edge; ``edge_weight``
    is indexed by canonical id."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    eid = np.asarray(edge_ids, np.int64)
    w = (
        np.ones(num_edges, np.float32)
        if edge_weight is None
        else np.asarray(edge_weight, np.float32)
    )[eid] if len(eid) else np.zeros(0, np.float32)
    R = int(rows)
    B = max(1, -(-num_nodes // R))

    win_s, win_d = src // R, dst // R
    dense = win_s == win_d
    dpos = win_d[dense] * R * R + (dst[dense] % R) * R + (src[dense] % R)
    D = np.zeros(B * R * R, np.float32)
    np.add.at(D, dpos, w[dense])

    keep = ~dense
    rem_src, rem_dst = src[keep], dst[keep]
    rem_eid, rem_w = eid[keep], w[keep]

    from gnn_tpu.ops.pallas.segment import build_chunk_plan

    rem_plan = build_chunk_plan(rem_dst, num_nodes)

    diag = jnp.asarray(D.reshape(B, R, R))
    if block_dtype is not None:
        diag = diag.astype(block_dtype)
    return BlockedLayout(
        diag=diag,
        diag_pos=jnp.asarray(dpos),
        diag_eid=jnp.asarray(eid[dense].astype(np.int32)),
        rem_src=jnp.asarray(rem_src.astype(np.int32)),
        rem_dst=jnp.asarray(rem_dst.astype(np.int32)),
        rem_w=None if edge_weight is None else jnp.asarray(rem_w),
        rem_eid=jnp.asarray(rem_eid.astype(np.int32)),
        rem_plan=rem_plan,
        num_nodes=int(num_nodes),
        rows=R,
    )


def refresh_blocked_weights(
    lay: BlockedLayout, weight: Optional[jax.Array], num_edges: int
) -> BlockedLayout:
    """Re-bake block/remainder weights after an edge-weight swap (layout
    constants — not a grad path)."""
    if weight is None:
        w_ext = jnp.ones((num_edges,), jnp.float32)
    else:
        w_ext = jax.lax.stop_gradient(weight.astype(jnp.float32))
    B, R, _ = lay.diag.shape
    D = jnp.zeros((B * R * R,), jnp.float32)
    D = D.at[lay.diag_pos].add(jnp.take(w_ext, lay.diag_eid))
    return lay.replace(
        diag=D.reshape(B, R, R).astype(lay.diag.dtype),
        rem_w=(
            None
            if weight is None and lay.rem_w is None
            else jnp.take(w_ext, lay.rem_eid)
        ),
    )


def blocked_matvec(lay: BlockedLayout, x: jax.Array) -> jax.Array:
    """out[d] = sum over in-edges (s -> d) of w * x[s], block-diagonal part
    on the MXU, remainder through the one-hot segment-sum kernel."""
    N, F = x.shape
    B, R, _ = lay.diag.shape
    pad = B * R - N
    xp = jnp.concatenate([x, jnp.zeros((pad, F), x.dtype)]) if pad else x
    xw = xp.reshape(B, R, F).astype(lay.diag.dtype)
    out = (
        jnp.einsum(
            "brw,bwf->brf", lay.diag, xw, preferred_element_type=jnp.float32
        )
        .reshape(B * R, F)[:N]
        .astype(x.dtype)
    )
    if lay.num_rem_edges:
        msg = jnp.take(x, lay.rem_src, axis=0)
        if lay.rem_w is not None:
            msg = msg * lay.rem_w[:, None].astype(msg.dtype)
        if (
            jax.default_backend() == "cpu"
            or lay.num_rem_edges < lay.rem_plan.chunk
        ):
            rem = jax.ops.segment_sum(
                msg, lay.rem_dst, N, indices_are_sorted=True
            )
        else:
            from gnn_tpu.ops.pallas.segment import segment_sum_sorted

            rem = segment_sum_sorted(
                msg, lay.rem_plan, N, dst_sorted=lay.rem_dst
            )
        out = out + rem.astype(x.dtype)
    return out
