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
   the straddler — see :func:`cluster_pack_order`), then nodes sorted
   WITHIN each window by descending remainder degree (window membership —
   and hence the dense/remainder split — is invariant to within-window
   order, and GNNs are permutation-equivariant, so this is free);
3. edges with src-window == dst-window are baked into ``diag [B, R, R]``
   (including self-loops);
4. the inter-window remainder goes through one of two backends, picked by
   a measured-ns cost model at build time (``rem_backend='auto'``):

   * **levels** — a SELL-style leveled ELL: level L is a ``[B * t_L, K_L]``
     slot table covering window-local rows < t_L, whose output adds to
     ``out.reshape(B, R, F)[:, :t_L]`` — a static slice, so there is NO
     scatter and NO combine (the descending within-window sort makes a
     shared prefix t_L valid across all windows); hub spill goes to a
     small scatter-add tail. Wins on Poisson-ish remainder degree
     distributions (real community graphs). Needs a degree-symmetric
     remainder (any symmetrized/GCN graph qualifies).
   * **kernel** — per-edge gather + the double-buffered one-hot MXU
     segment kernel (ops/pallas/segment.py). Wins on heavy-tailed
     remainders, where prefix strips pad too much (measured ~2.6 ns/slot
     means slot count is everything — docs/PERF.md round 3).

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


class RemLevel(Module):
    """One remainder level: K slots for window-local rows < t, every
    window. Output adds to ``out.reshape(B, R, F)[:, :t]`` — no scatter."""

    col: jax.Array  # [B*t, K] int32 source ids (padding: 0, weight 0)
    w: jax.Array  # [B*t, K] f32 slot weights
    eid: jax.Array  # [B*t, K] int32 canonical edge ids (E = padding)
    t: int = static_field(default=0)
    k: int = static_field(default=1)


class BlockedLayout(Module):
    """Block-diagonal dense + leveled-ELL remainder, in the packed order."""

    diag: jax.Array  # [B, R, R] block values; diag[b, r, c] = w(edge
    # src = b*R+c -> dst = b*R+r), 0 where no edge
    diag_pos: jax.Array  # [E_d] int64 flat B*R*R position per dense edge
    diag_eid: jax.Array  # [E_d] int32 canonical edge id per dense edge
    rem_src: jax.Array  # [E_r] int32 remainder sources (packed ids)
    rem_dst: jax.Array  # [E_r] int32 remainder destinations, ascending
    rem_w: Optional[jax.Array]  # [E_r] f32 or None (= ones)
    rem_eid: jax.Array  # [E_r] int32 canonical edge ids
    rem_plan: object  # ops.pallas.segment.ChunkPlan over rem_dst (fallback
    # path for remainders whose within-window degrees are not sorted)
    # Degree-bucketed static-weight remainder (round 5; see
    # ops/edge_agg.py WeightedAggLayout): slots gather x directly at the
    # node-table rate — no [E_r, F] message array, no one-hot MACs.
    rem_bucket: object = None
    # Leveled-ELL remainder (see module docstring):
    levels: Tuple[RemLevel, ...] = ()
    tail_col: Optional[jax.Array] = None  # [T, Kt] spill pieces
    tail_w: Optional[jax.Array] = None
    tail_eid: Optional[jax.Array] = None
    tail_node: Optional[jax.Array] = None  # [T] destination (packed id)
    use_levels: bool = static_field(default=False)
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

    @property
    def num_level_slots(self) -> int:
        s = sum(int(np.prod(l.col.shape)) for l in self.levels)
        if self.tail_col is not None:
            s += int(np.prod(self.tail_col.shape))
        return s


def cluster_order(
    edge_index,
    num_nodes: int,
    *,
    max_size: int = 0,
    n_iters: int = 10,
    seed: int = 0,
    pack_rows: int = 0,
    refine_sweeps: int = 2,
) -> np.ndarray:
    """Node permutation (new -> old) grouping nodes by discovered community
    (label propagation, native graph-core), communities in node-id order.

    The locality primitive behind both fast paths: feed it to
    ``build_adjacency(reorder='cluster')`` windows (done internally there)
    or apply it BEFORE ``partition_graph`` so the contiguous node-range
    partition cuts between communities instead of through them — the halo
    (and hence all_to_all bytes) shrinks toward the graph's inter-community
    edge fraction (docs/SCALING.md's second table).

    ``pack_rows=R`` additionally packs the communities into windows of
    exactly R nodes (:func:`cluster_pack_order`, with the community size cap
    forced to R) so that every R-aligned boundary splits at most one
    community, then runs ``refine_sweeps`` boundary-refinement swap sweeps
    (:func:`refine_window_order`; 0 disables). This is the order to use ahead of
    ``partition_graph(local_blocked=R)``: part boundaries land on R
    multiples, so community integrity holds at BOTH the partition level
    (small halo) and the window level (dense diagonal blocks capture the
    intra-community edges)."""
    from gnn_tpu import native

    if pack_rows and max_size and max_size != pack_rows:
        raise ValueError(
            f"cluster_order: pack_rows={pack_rows} forces the community "
            f"size cap, conflicting with max_size={max_size} — pass only "
            "one (pack_rows implies max_size=pack_rows)"
        )
    ei = np.asarray(edge_index)
    order0, rp0 = native.sort_edges_csr(ei[0], ei[1], num_nodes)
    labels, _ = native.label_propagation(
        rp0,
        ei[0].astype(np.int64)[order0],
        max_size=pack_rows if pack_rows else max_size,
        n_iters=n_iters,
        seed=seed,
    )
    if pack_rows:
        perm = cluster_pack_order(labels, int(pack_rows))
        return refine_window_order(
            perm,
            int(pack_rows),
            row_ptr=rp0,
            col=ei[0].astype(np.int64)[order0],
            n_sweeps=refine_sweeps,
        )
    return np.argsort(labels, kind="stable")


def cluster_pack_order(labels: np.ndarray, rows: int) -> np.ndarray:
    """Node permutation (new -> old) packing communities into windows of
    exactly ``rows`` nodes.

    First-fit-decreasing bin packing of the label groups (communities
    larger than a window are pre-chopped into window-size chunks); bins
    that end underfull are concatenated and cut at window boundaries, so
    every window boundary splits at most one community. Deterministic for
    a given labeling.

    The native graph-core runs this with a segment-tree first-fit
    (graph_native.cpp cluster_pack — same result, O(C log B) instead of
    the Python scan's O(C x B); at 100M edges the Python packer was the
    slowest prep phase, 40 s). Falls back to the Python scan below."""
    labels = np.asarray(labels, np.int64)
    n = len(labels)
    if n:
        from gnn_tpu import native

        perm = native.cluster_pack(labels, int(rows))
        if perm is not None:
            return perm
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


def refine_window_order(
    perm: np.ndarray,
    rows: int,
    *,
    row_ptr: np.ndarray,
    col: np.ndarray,
    n_sweeps: int = 2,
) -> np.ndarray:
    """Boundary-refine a packed window order: greedy KL-style swaps of
    nodes between windows (native graph-core ``refine_windows``) raise the
    intra-window edge capture that label propagation + FFD packing leave on
    the table (straddlers, split communities). Window sizes are preserved;
    within-window order keeps the packing's order (``refine_pack_order``
    re-sorts it afterwards anyway). ``row_ptr``/``col`` are the dst-major
    CSR over ORIGINAL node ids (the one LP already built); ``perm`` is
    new -> old."""
    from gnn_tpu import native

    perm = np.asarray(perm, np.int64)
    n = len(perm)
    if n == 0 or n_sweeps <= 0:
        return perm
    old2new = np.empty(n, np.int64)
    old2new[perm] = np.arange(n)
    R = int(rows)
    win, swaps = native.refine_windows(
        row_ptr, col, old2new // R, -(-n // R), n_sweeps=n_sweeps
    )
    if swaps == 0:
        return perm
    # Stable re-sort of positions by refined window: every window keeps its
    # exact size (swaps are pairwise), so slice boundaries stay R-aligned.
    return perm[np.argsort(win[perm], kind="stable")]


def refine_pack_order(
    perm: np.ndarray, src: np.ndarray, dst: np.ndarray, rows: int
) -> np.ndarray:
    """Re-sort nodes WITHIN each R-row window by descending remainder
    (inter-window) in-degree. Window membership — and hence the
    dense/remainder edge split — is unchanged; the descending order is what
    lets the leveled-ELL remainder share one prefix t per level across all
    windows. ``perm`` is new -> old from :func:`cluster_pack_order`;
    ``src``/``dst`` are ORIGINAL-id edges."""
    perm = np.asarray(perm, np.int64)
    n = len(perm)
    old2new = np.empty(n, np.int64)
    old2new[perm] = np.arange(n)
    s, d = old2new[np.asarray(src, np.int64)], old2new[np.asarray(dst, np.int64)]
    R = int(rows)
    rem = s // R != d // R
    deg = np.bincount(d[rem], minlength=n)
    window = np.arange(n) // R
    # stable sort by (window, -deg): within-window descending remainder deg
    order = np.lexsort((-deg, window))
    return perm[order]


_LEVEL_WIDTHS = (1, 2, 4, 8, 16)
_MAX_LEVELS = 8  # each level also costs one prefix-slice add
_LEVEL_FIXED_SLOTS = 50_000  # that add, in gather-slot-equivalents
_TAIL_RATE = 8.0  # a tail piece costs ~20 slot-equivalents of scatter +
# its 16 gather slots over ~4-5 real edges — only hubs belong there
_TAIL_K = 16


def _build_rem_levels(
    rem_src, rem_dst, rem_eid, rem_w, num_nodes, num_edges, R, B
):
    """Leveled-ELL tables over a dst-sorted remainder whose per-window
    degrees are non-increasing (see refine_pack_order). Returns
    (levels, tail arrays) or None when the sortedness precondition fails
    (e.g. a directed remainder refined for the transpose direction).

    Strip schedule is cost-driven: each level is a (t, K) prefix strip
    chosen greedily to maximize real edge coverage subject to a fill-
    efficiency floor (total slot count is what the gather pays — measured
    ~2.6 ns/slot regardless of shape). Whatever no efficient strip covers
    (hub rows, stragglers) spills to width-16 scatter-add tail pieces.
    Any (t, K) schedule is *correct* — per-node coverage counters assign
    each node's next-K CSR edges to each strip — the floor only bounds
    padding waste."""
    Npad = B * R
    deg = np.bincount(rem_dst, minlength=Npad)
    by_win = deg.reshape(B, R)
    if (np.diff(by_win, axis=1) > 0).any():
        return None
    rp = np.concatenate([[0], np.cumsum(deg)])
    pos = np.arange(Npad) % R

    covered = np.zeros(Npad, np.int64)
    levels = []
    while len(levels) < _MAX_LEVELS:
        rem = deg - covered
        if rem.max() <= 0:
            break
        # farthest active position (not count: coverage holes are possible
        # once earlier strips zero out small prefix rows)
        act_pos = np.where(rem > 0, pos, -1).reshape(B, R).max(axis=1) + 1
        cands = sorted(
            {
                max(1, int(np.ceil(q)))
                for q in np.percentile(act_pos, [50, 75, 90, 99, 100])
                if q > 0
            }
        )
        # coverage of a (t, K) strip = sum over prefix rows of min(rem, K);
        # a positional prefix sum makes the candidate sweep O(R * widths).
        # Objective: minimize time per covered edge = (slots + fixed level
        # cost) / cover; stop when the tail's per-edge rate is cheaper.
        best = None
        for K in _LEVEL_WIDTHS:
            gain_by_pos = np.zeros(R, np.int64)
            np.add.at(gain_by_pos, pos, np.minimum(rem, K))
            csum = np.cumsum(gain_by_pos)
            for t in cands:
                cover = int(csum[t - 1])
                if cover == 0:
                    continue
                ratio = (B * t * K + _LEVEL_FIXED_SLOTS) / cover
                if best is None or ratio < best[0]:
                    best = (ratio, t, K)
        if best is None or best[0] >= _TAIL_RATE:
            break
        _, t, K = best
        nodes = (np.arange(B)[:, None] * R + np.arange(t)[None, :]).ravel()
        base = rp[nodes] + covered[nodes]
        avail = np.clip(deg[nodes] - covered[nodes], 0, K)
        mask = np.arange(K)[None, :] < avail[:, None]
        colt = np.zeros((len(nodes), K), np.int64)
        wt = np.zeros((len(nodes), K), np.float32)
        et = np.full((len(nodes), K), num_edges, np.int64)
        flat = (base[:, None] + np.arange(K)[None, :])[mask]
        colt[mask] = rem_src[flat]
        wt[mask] = rem_w[flat]
        et[mask] = rem_eid[flat]
        levels.append(
            RemLevel(
                col=jnp.asarray(colt.astype(np.int32)),
                w=jnp.asarray(wt),
                eid=jnp.asarray(et.astype(np.int32)),
                t=t,
                k=K,
            )
        )
        covered[nodes] += avail
    # spill: anything the strips didn't cover, as width-_TAIL_K pieces
    extra = np.clip(deg - covered, 0, None)
    hubs = np.nonzero(extra)[0]
    npieces = -(-extra[hubs] // _TAIL_K)
    T = int(npieces.sum())
    if T:
        tail_node = np.repeat(hubs, npieces)
        piece_idx = np.arange(T) - np.repeat(
            np.cumsum(npieces) - npieces, npieces
        )
        base = (
            rp[tail_node] + covered[tail_node] + piece_idx * _TAIL_K
        )
        avail = np.clip(
            extra[tail_node] - piece_idx * _TAIL_K, 0, _TAIL_K
        )
        mask = np.arange(_TAIL_K)[None, :] < avail[:, None]
        colt = np.zeros((T, _TAIL_K), np.int64)
        wt = np.zeros((T, _TAIL_K), np.float32)
        et = np.full((T, _TAIL_K), num_edges, np.int64)
        flat = (base[:, None] + np.arange(_TAIL_K)[None, :])[mask]
        colt[mask] = rem_src[flat]
        wt[mask] = rem_w[flat]
        et[mask] = rem_eid[flat]
        tail = (
            jnp.asarray(colt.astype(np.int32)),
            jnp.asarray(wt),
            jnp.asarray(et.astype(np.int32)),
            jnp.asarray(tail_node.astype(np.int32)),
        )
    else:
        tail = (None, None, None, None)
    return tuple(levels), tail


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
    rem_backend: str = "auto",
) -> BlockedLayout:
    """Build from PACKED-id edges in dst-sorted order. ``edge_ids`` are the
    canonical (adjacency-order) edge ids of each input edge; ``edge_weight``
    is indexed by canonical id. ``rem_backend``: 'auto' picks the cheapest
    remainder path by measured cost model; 'bucket'/'levels'/'kernel'
    force one (bucket = degree-bucketed direct slot tables, the round-5
    default winner on power-law remainders — measured A/B in
    docs/PERF.md)."""
    if rem_backend not in ("auto", "bucket", "levels", "kernel"):
        raise ValueError(f"unknown rem_backend '{rem_backend}'")
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

    built = None
    if rem_backend in ("auto", "levels"):
        built = _build_rem_levels(
            rem_src, rem_dst, rem_eid, rem_w, num_nodes, num_edges, R, B
        )
    # Measured-cost chooser (ns, this chip): slot/strip gathers ~2.6 each,
    # a prefix add ~130k, a tail piece ~66, the one-hot kernel ~6.5/edge;
    # the bucket backend adds one [N]-row combine gather (~2.6/row). The
    # bucket slot count is predictable from the remainder degree
    # histogram (fixed width set, +~4% padding on power-law remainders),
    # so it can be costed WITHOUT building.
    choice = rem_backend
    if rem_backend == "auto":
        deg_r = np.bincount(rem_dst, minlength=num_nodes) if len(rem_dst) else np.zeros(1, np.int64)
        widths_b = np.asarray(sorted({*range(1, 17), *(8 * m for m in range(3, 65))}), np.int64)
        rem_mod = deg_r % 512
        nz = rem_mod[rem_mod > 0]
        bucket_slots = int(
            widths_b[np.minimum(np.searchsorted(widths_b, nz), len(widths_b) - 1)].sum()
            + (deg_r // 512).sum() * 512
        )
        costs = {
            "kernel": len(rem_src) * 6.5,
            "bucket": bucket_slots * 2.6 + num_nodes * 2.6,
        }
        if built is not None:
            levels_, tail_ = built
            n_pieces = 0 if tail_[0] is None else int(tail_[0].shape[0])
            lvl_slots = sum(int(np.prod(l.col.shape)) for l in levels_)
            costs["levels"] = (
                lvl_slots * 2.6 + len(levels_) * 130_000 + n_pieces * 66
            )
        choice = min(costs, key=costs.get)
    rem_plan = None
    rem_bucket = None
    use_levels = False
    levels, tail = (), (None, None, None, None)
    if choice == "levels":
        if built is not None:
            levels, tail = built
            use_levels = True  # may be tail-only (empty strip list)
        else:
            choice = "kernel"  # unsorted remainder: no prefix structure
    if choice == "bucket":
        from gnn_tpu.ops.edge_agg import build_weighted_agg

        rem_bucket = build_weighted_agg(
            rem_dst, rem_src, rem_eid, rem_w, num_nodes, num_edges
        )
    elif choice == "kernel":
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
        rem_bucket=rem_bucket,
        levels=levels,
        tail_col=tail[0],
        tail_w=tail[1],
        tail_eid=tail[2],
        tail_node=tail[3],
        use_levels=use_levels,
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
    # padding slots (eid == num_edges) must re-bake to weight 0
    w_ext = jnp.concatenate([w_ext, jnp.zeros((1,), jnp.float32)])
    B, R, _ = lay.diag.shape
    D = jnp.zeros((B * R * R,), jnp.float32)
    D = D.at[lay.diag_pos].add(jnp.take(w_ext, lay.diag_eid))
    from gnn_tpu.ops.edge_agg import refresh_weighted_agg

    return lay.replace(
        diag=D.reshape(B, R, R).astype(lay.diag.dtype),
        rem_w=(
            None
            if weight is None and lay.rem_w is None
            else jnp.take(w_ext, lay.rem_eid)
        ),
        rem_bucket=(
            None
            if lay.rem_bucket is None
            else refresh_weighted_agg(lay.rem_bucket, w_ext)
        ),
        levels=tuple(
            l.replace(w=jnp.take(w_ext, l.eid)) for l in lay.levels
        ),
        tail_w=(
            None
            if lay.tail_eid is None
            else jnp.take(w_ext, lay.tail_eid)
        ),
    )


def _unrolled(x, col2d, w2d):
    """Sum_k w[:, k] * x[col[:, k]] as a chain of FLAT gathers (<= 16 —
    the measured-fastest gather expression, see graphs/sorted_ell.py)."""
    acc = w2d[:, 0, None] * jnp.take(x, col2d[:, 0], axis=0)
    for k in range(1, col2d.shape[1]):
        acc = acc + w2d[:, k, None] * jnp.take(x, col2d[:, k], axis=0)
    return acc


def blocked_matvec(lay: BlockedLayout, x: jax.Array) -> jax.Array:
    """out[d] = sum over in-edges (s -> d) of w * x[s]: block-diagonal part
    on the MXU, remainder through the leveled ELL (static prefix-slice
    adds — no scatter) or, for unsorted remainders, the one-hot kernel."""
    N, F = x.shape
    B, R, _ = lay.diag.shape
    pad = B * R - N
    xp = jnp.concatenate([x, jnp.zeros((pad, F), x.dtype)]) if pad else x
    xw = xp.reshape(B, R, F).astype(lay.diag.dtype)
    out3 = jnp.einsum(
        "brw,bwf->brf", lay.diag, xw, preferred_element_type=jnp.float32
    )
    if lay.rem_bucket is not None:
        # round-5 default on power-law remainders: degree-bucketed slot
        # tables gather x DIRECTLY at the node-table rate (ops/edge_agg.py)
        from gnn_tpu.ops.edge_agg import weighted_agg_matvec

        out = out3.reshape(B * R, F)[:N].astype(x.dtype)
        if lay.num_rem_edges:
            out = out + weighted_agg_matvec(x, lay.rem_bucket)
        return out
    if lay.use_levels:
        for lev in lay.levels:
            part = _unrolled(x, lev.col, lev.w)  # [B*t, F] f32
            out3 = out3.at[:, : lev.t, :].add(
                part.reshape(B, lev.t, F).astype(out3.dtype)
            )
        out = out3.reshape(B * R, F)
        if lay.tail_col is not None:
            tails = _unrolled(x, lay.tail_col, lay.tail_w)
            out = out.at[lay.tail_node].add(tails.astype(out.dtype))
        return out[:N].astype(x.dtype)
    out = out3.reshape(B * R, F)[:N].astype(x.dtype)
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
