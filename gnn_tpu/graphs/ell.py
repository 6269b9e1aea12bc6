"""Degree-bucketed ELL layout — the scatter-free SpMM format.

Why this exists: XLA's scatter-add on TPU costs ~12x its roofline (measured:
2.3M-row sorted scatter ~19.5 ms vs ~1.6 ms of HBM traffic), while gathers
run at the hardware's index rate. So the fast SpMM formulation is one with
NO scatter at all:

  1. Each destination node's in-edge list is padded to a power-of-2 width K
     and placed in the ELL bucket for that K (padding <= 2x, typically ~1.3x
     on power-law graphs). Nodes with degree > K_max are split across
     multiple K_max-wide rows.
  2. Forward per bucket: ``out_part = einsum('nk,nkf->nf', w, x[col])`` —
     gather + dense reduction, fully XLA-fusable, zero scatter.
  3. Per-node combine: one permutation *gather* for single-row (light)
     nodes, plus a tiny fix-up for the few split (heavy) nodes.

The backward dx runs the same machinery on the transpose graph's ELL, so
neither direction ever scatters. Weights stay stored per-edge (dst-sorted
order, as in :class:`~gnn_tpu.graphs.adjacency.Adjacency`); each ELL slot
carries ``slot_to_edge`` so the kernel gathers current weights on the fly —
cheap, and it keeps ``with_weight`` O(1).

This plays the role the dense densification does in the reference
(src/graph.cpp:207): the physical layout aggregation actually runs on.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gnn_tpu.nn.module import Module, static_field

__all__ = ["EllBlock", "EllLayout", "build_ell", "optimal_buckets"]

DEFAULT_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512)


# Measured per-slot gather rate vs ELL width, relative to the fastest
# (benchmarks/gather_rate.py, TPU v5e via axon, F=128, 2026-08-19: the time
# of gather[Nb,K,F] + weighted sum over K at constant total slots). Full
# index rate only at K in {1, 16, 24, 32, 64, 128}; K=8 pays ~8%, K in {2,4}
# ~30%, odd small widths ~60-90%, and K=12 a surprising 2.25x. Widths
# between measured points interpolate linearly; beyond the table they take
# the last value.
_RATE_TABLE: Tuple[Tuple[int, float], ...] = (
    (1, 1.000),
    (2, 1.334),
    (3, 1.920),
    (4, 1.300),
    (5, 1.779),
    (6, 1.747),
    (7, 1.578),
    (8, 1.082),
    (12, 2.247),
    (16, 1.043),
    (24, 1.004),
    (32, 1.008),
    (64, 1.014),
    (128, 1.013),
    (512, 1.013),
)

# Cost (in slot-gather units) charged per EXTRA piece a remainder splits
# into: one more partial row through the combine (write + one row of the
# inv2 gather). Keeps the cover model from shattering remainders.
_PIECE_COST = 2.0


def _width_rate(widths: np.ndarray) -> np.ndarray:
    ks = np.asarray([k for k, _ in _RATE_TABLE], np.float64)
    rs = np.asarray([r for _, r in _RATE_TABLE], np.float64)
    return np.interp(np.asarray(widths, np.float64), ks, rs)


def _cover_table(buckets) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Cheapest 1- or 2-piece cover of every remainder r in [0, kmax).

    A node's remainder (deg mod kmax) does not have to occupy a single
    padded row: rem=12 as one width-8 row + one width-4 row costs
    8*1.08 + 4*1.30 = 13.8 slot-units versus 16.7 for a single width-16 row
    — on the arxiv-scale power-law workload this cuts total padding from
    ~+28% to ~+5% (the dominant term of the round-1 SOL gap, VERDICT #1).

    Cost of a piece of width w = w * measured gather rate(w); a second piece
    is charged ``_PIECE_COST`` extra for its combine row. Returns
    ``(w1, w2, cost)`` arrays indexed by r, ``w2[r] == 0`` meaning a single
    piece. Piece 1 is the wider piece and is filled first.
    """
    ws = np.asarray(sorted(set(int(b) for b in buckets)), np.int64)
    rate = _width_rate(ws)
    cost_w = ws.astype(np.float64) * rate
    kmax = int(ws[-1])
    W = len(ws)
    w1 = np.zeros(kmax, np.int64)
    w2 = np.zeros(kmax, np.int64)
    cost = np.zeros(kmax, np.float64)
    # Single piece: cheapest width >= r (cost is NOT monotone in width —
    # e.g. width 12 costs more than width 16 — so take a suffix argmin).
    suf_arg = np.zeros(W, np.int64)
    best = W - 1
    for i in range(W - 1, -1, -1):
        if cost_w[i] <= cost_w[best]:
            best = i
        suf_arg[i] = best
    r = np.arange(1, kmax)
    s1 = suf_arg[np.searchsorted(ws, r)]
    w1[1:] = ws[s1]
    cost[1:] = cost_w[s1]
    # Two pieces: all (i >= j) width pairs, capacity ws[i]+ws[j]. For each r
    # the best pair among capacities >= r via a capacity-sorted suffix-min.
    ii, jj = np.triu_indices(W)  # i <= j; piece1 = wider = ws[jj]
    cap = ws[ii] + ws[jj]
    pcost = cost_w[ii] + cost_w[jj] + _PIECE_COST
    order = np.argsort(cap, kind="stable")
    cap_s, pcost_s = cap[order], pcost[order]
    pi_s, pj_s = ii[order], jj[order]
    sufmin = np.zeros(len(cap_s), np.int64)
    best = len(cap_s) - 1
    for t in range(len(cap_s) - 1, -1, -1):
        if pcost_s[t] <= pcost_s[best]:
            best = t
        sufmin[t] = best
    pos = np.searchsorted(cap_s, r)
    ok = pos < len(cap_s)
    bp = sufmin[np.minimum(pos, len(cap_s) - 1)]
    better = ok & (pcost_s[bp] < cost[1:])
    # The wider piece must actually be SHORTER than r (else the single-width
    # cover would already be at least as cheap); guaranteed by cost but
    # enforce for the fill math (c1 = w1 < r, c2 = r - w1 <= w2).
    big, small = ws[pj_s[bp]], ws[pi_s[bp]]
    better &= big < r
    idx = r[better]
    w1[idx] = big[better]
    w2[idx] = small[better]
    cost[idx] = pcost_s[bp[better]]
    return w1, w2, cost


def _interval_dp(deg: np.ndarray, max_blocks: int, kmax: int) -> Tuple[int, ...]:
    """Degree-adaptive aligned-width set via an exact interval DP.

    Generates ONE candidate set for :func:`optimal_buckets`: widths from
    {1,2,4} ∪ 8·m chosen to minimize rate-weighted single-piece slot cost —
    pad(S) depends only on which width each remainder maps to, an optimal S
    uses only widths equal to some remainder value, and the 1-D structure
    gives an O(B·D²) DP over the D distinct remainder values.
    """
    deg = np.asarray(deg, np.int64)
    deg = deg[deg > 0]
    if deg.size == 0:
        return (1,)
    kmax = int(min(kmax, deg.max()))
    # Candidate widths are restricted to sublane-friendly values: measured
    # on-chip, K in {1,8,16,32,...} gathers at the full index rate while
    # unaligned K is substantially slower (docs/PERF.md) — width-11/19/29
    # buckets lost more per-slot speed than their padding savings bought.
    allowed = np.asarray(
        sorted({1, 2, 4} | set(range(8, max(kmax, 8) + 8, 8))), np.int64
    )
    kmax = int(allowed[np.searchsorted(allowed, kmax)])
    rem = deg % kmax  # deg == kmax -> a full (pad-free) kmax piece
    rem = rem[rem > 0]
    if rem.size == 0:
        return (kmax,)
    # Any chosen set is a subset of `allowed`, so each remainder's width is
    # at least the next allowed value: round up first, then DP as before.
    rem = allowed[np.searchsorted(allowed, rem)]
    vals, counts = np.unique(rem, return_counts=True)
    # kmax (the split width) is always in the final set; make it the forced
    # largest DP value so it occupies exactly one of the max_blocks slots —
    # whether or not any remainder rounds up to it.
    if vals[-1] != kmax:
        vals = np.append(vals, kmax)
        counts = np.append(counts, 0)
    D = len(vals)
    B = max(1, min(max_blocks, D))
    csum = np.concatenate([[0], np.cumsum(counts)])
    # Per-width cost coefficient: width x measured per-slot gather rate
    # (relative; 1.0 = full index rate). Minimizing sum(count * coef) is
    # then minimizing predicted gather TIME, not raw slots.
    coef = vals.astype(np.float64) * _width_rate(vals)
    INF = np.inf
    # dp[b][i]: min cost covering vals[:i+1] with b widths, vals[i] chosen
    # (the largest width must be a chosen one, so answers sit at i = D-1).
    dp = np.full((B + 1, D), INF)
    arg = np.zeros((B + 1, D), np.int64)
    dp[1] = coef * csum[1:]
    for b in range(2, B + 1):
        prev = dp[b - 1]
        for i in range(b - 1, D):
            # dp[b-1][j] + coef[i] * (csum[i+1] - csum[j+1]) over j < i
            cand = prev[:i] + coef[i] * (csum[i + 1] - csum[1 : i + 1])
            j = int(np.argmin(cand))
            dp[b][i], arg[b][i] = cand[j], j
    b_best = int(np.argmin(dp[1:, D - 1])) + 1
    chosen, i = [], D - 1
    for b in range(b_best, 0, -1):
        chosen.append(int(vals[i]))
        i = int(arg[b][i])
    return tuple(sorted(set(chosen) | {kmax}))


def optimal_buckets(
    deg: np.ndarray, max_blocks: int = 10, kmax: int = 512
) -> Tuple[int, ...]:
    """Degree-adaptive bucket widths minimizing predicted gather TIME.

    Candidate width sets (each capped at ``max_blocks`` — the measured
    per-fusion-overhead regime, docs/PERF.md) are scored under the 2-piece
    remainder cover of :func:`_cover_table` with the measured per-width
    gather rates of ``_RATE_TABLE``; the cheapest set wins. Candidates:

    * the aligned-width interval DP (:func:`_interval_dp`) — degree-adaptive;
    * powers of two up to kmax;
    * an "octave" set {1,2,4,8,16,24,32,48,64,kmax} dense where remainders
      are dense on power-law graphs.

    On the bench workload (arxiv-scale power law) the winner pads +5% slots
    versus +28% for the best single-piece aligned set.
    """
    deg = np.asarray(deg, np.int64)
    deg = deg[deg > 0]
    if deg.size == 0:
        return (1,)
    kmax = int(min(kmax, deg.max()))
    # Align the split width like _interval_dp does.
    allowed_k = np.asarray(sorted({1, 2, 4} | set(range(8, max(kmax, 8) + 8, 8))))
    kmax = int(allowed_k[np.searchsorted(allowed_k, kmax)])

    def trim(widths) -> Tuple[int, ...]:
        ws = sorted(set(int(w) for w in widths if w <= kmax) | {kmax})
        # Respect the block budget: drop from the middle-large end first
        # (large non-kmax widths serve the fewest remainders under covers).
        while len(ws) > max_blocks:
            ws.pop(-2)
        return tuple(ws)

    candidates = {
        trim(_interval_dp(deg, max_blocks, kmax)),
        trim(2 ** np.arange(0, 10)),
        trim((1, 2, 4, 8, 16, 24, 32, 48, 64)),
    }
    full_total = int((deg // kmax).sum())
    rem = deg % kmax
    counts = np.bincount(rem, minlength=kmax)

    def score(ws) -> float:
        _, _, cost = _cover_table(ws)
        return float(
            full_total * kmax * _width_rate(np.asarray([kmax]))[0]
            + (counts[1:] * cost[1:]).sum()
        )

    # Tie-break toward fewer blocks (then lexicographically, for determinism).
    return min(candidates, key=lambda ws: (score(ws), len(ws), ws))


class EllBlock(Module):
    """One fixed-width bucket: Nb rows of K slots each."""

    col: jax.Array  # [Nb, K] int32 source-node ids (0 where padded)
    slot_to_edge: jax.Array  # [Nb, K] int32 edge id in dst-sorted order, E if pad
    rows: jax.Array  # [Nb] int32 destination node of each row
    w: jax.Array  # [Nb, K] f32 slot weights, 0 where padded (pre-gathered:
    # a per-slot scalar gather at runtime costs ~2.3ns/slot on TPU — more
    # than the feature-row gather itself — so weights are baked at prep)
    k: int = static_field(default=1)


class EllLayout(Module):
    blocks: Tuple[EllBlock, ...]
    inv_light: jax.Array  # [N] int32 part-row id per node (R_total => zero row)
    heavy_ids: jax.Array  # [H] int32 node ids with >2 part rows
    heavy_slots: jax.Array  # [H, J] int32 part-row ids (R_total padded)
    edge_to_slot: jax.Array  # [E] int32 flat slot index of each edge
    # Second-piece combine map for 2-piece remainder covers (None when no
    # node has exactly two part rows): [N] int32, R_total for 1-piece nodes.
    inv_light2: jax.Array | None = None
    num_rows_total: int = static_field(default=0)  # R_total
    num_nodes: int = static_field(default=0)
    num_edges: int = static_field(default=0)

    @property
    def num_slots(self) -> int:
        return sum(int(b.col.size) for b in self.blocks)


def build_ell(
    row_ptr: np.ndarray,
    col_of_edge: np.ndarray,
    edge_of_slotorder: np.ndarray,
    num_nodes: int,
    num_edges: int,
    buckets: Tuple[int, ...] = DEFAULT_BUCKETS,
    edge_weight: np.ndarray | None = None,
) -> EllLayout:
    """Host-side construction.

    ``row_ptr``: CSR offsets per destination node over some edge ordering;
    ``col_of_edge``: the source node of each edge in that ordering;
    ``edge_of_slotorder``: maps position in that ordering -> canonical edge
    id (identity for the forward graph; ``t_perm`` for the transpose).
    """
    row_ptr = np.asarray(row_ptr, np.int64)
    col_of_edge = np.asarray(col_of_edge, np.int64)
    edge_of_slotorder = np.asarray(edge_of_slotorder, np.int64)
    deg = np.diff(row_ptr)
    buckets = tuple(sorted(set(int(b) for b in buckets)))
    buckets_arr = np.asarray(buckets, np.int64)
    kmax = int(buckets_arr[-1])

    # Piece assignment: each node contributes floor(d/kmax) full K_max pieces
    # plus its remainder covered by ONE OR TWO rows per the measured-rate
    # cover table (rem=12 -> an 8-row + a 4-row rather than padding to 16;
    # see _cover_table — this is where the round-1 +28% padding went).
    cw1, cw2, _ = _cover_table(buckets)
    full = deg // kmax
    rem = deg % kmax
    n_full_total = int(full.sum())
    full_nodes = np.repeat(np.arange(num_nodes), full)
    idx_within = np.arange(n_full_total) - np.repeat(np.cumsum(full) - full, full)
    full_starts = row_ptr[full_nodes] + idx_within * kmax
    rem_nodes = np.nonzero(rem > 0)[0]
    rem_r = rem[rem_nodes]
    rem_starts = row_ptr[rem_nodes] + full[rem_nodes] * kmax
    # Piece 1 (the wider piece) takes the first c1 edges; piece 2 the rest.
    p1_w = cw1[rem_r]
    p2_w = cw2[rem_r]
    p1_counts = np.minimum(rem_r, p1_w)
    has2 = p2_w > 0
    p2_nodes = rem_nodes[has2]
    p2_starts = rem_starts[has2] + p1_counts[has2]
    p2_counts = rem_r[has2] - p1_counts[has2]
    p1_bucket = np.searchsorted(buckets_arr, p1_w)
    p2_bucket = np.searchsorted(buckets_arr, p2_w[has2])

    blocks = []
    total_rows = 0
    total_slots = 0
    edge_to_slot = np.zeros(num_edges, np.int64)
    all_piece_nodes = []  # (node, global_row) in bucket emission order
    for bi, k in enumerate(buckets):
        sel1 = p1_bucket == bi
        sel2 = p2_bucket == bi
        nodes_b = [rem_nodes[sel1], p2_nodes[sel2]]
        starts_b = [rem_starts[sel1], p2_starts[sel2]]
        counts_b = [p1_counts[sel1], p2_counts[sel2]]
        if k == kmax:
            nodes_b.append(full_nodes)
            starts_b.append(full_starts)
            counts_b.append(np.full(n_full_total, kmax))
        nodes_b = np.concatenate(nodes_b)
        starts_b = np.concatenate(starts_b)
        counts_b = np.concatenate(counts_b)
        nb = len(nodes_b)
        if nb == 0:
            continue
        slot_pos = starts_b[:, None] + np.arange(k)[None, :]
        valid = np.arange(k)[None, :] < counts_b[:, None]
        slot_pos = np.where(valid, slot_pos, 0)
        edge_ids = np.where(valid, edge_of_slotorder[slot_pos], num_edges)
        cols = np.where(valid, col_of_edge[slot_pos], 0)
        if edge_weight is None:
            w_b = valid.astype(np.float32)
        else:
            w_b = np.where(
                valid, np.asarray(edge_weight, np.float32)[np.where(valid, edge_ids, 0)], 0.0
            ).astype(np.float32)
        flat_slots = total_slots + np.arange(nb * k).reshape(nb, k)
        edge_to_slot[edge_ids[valid]] = flat_slots[valid]
        total_slots += nb * k
        all_piece_nodes.append(
            np.stack([nodes_b, total_rows + np.arange(nb)], axis=1)
        )
        blocks.append(
            EllBlock(
                # dtype casts happen in numpy: an on-device cast is a
                # separate remotely-compiled executable per shape (~0.3 s
                # each through the axon tunnel)
                col=jnp.asarray(np.asarray(cols, np.int32)),
                slot_to_edge=jnp.asarray(np.asarray(edge_ids, np.int32)),
                rows=jnp.asarray(np.asarray(nodes_b, np.int32)),
                w=jnp.asarray(np.asarray(w_b, np.float32)),
                k=int(k),
            )
        )
        total_rows += nb

    # Combine maps (vectorized): group part rows by node. 1 piece -> the
    # inv_light permutation gather; exactly 2 -> inv_light + inv_light2
    # (one extra N-row gather, no scatter); >2 (kmax-split hubs) -> the
    # small heavy fix-up table.
    n_pieces = full + (rem > 0).astype(np.int64)
    n_pieces[p2_nodes] += 1
    inv_light = np.full(num_nodes, total_rows, np.int64)  # default: zero row
    inv_light2 = None
    if all_piece_nodes:
        pairs = np.concatenate(all_piece_nodes)  # [(node, row)]
        npc = n_pieces[pairs[:, 0]]
        light = npc == 1
        inv_light[pairs[light, 0]] = pairs[light, 1]
        two = npc == 2
        if two.any():
            tp = pairs[two]
            tp = tp[np.argsort(tp[:, 0], kind="stable")]
            assert (tp[0::2, 0] == tp[1::2, 0]).all()
            inv_light2 = np.full(num_nodes, total_rows, np.int64)
            inv_light[tp[0::2, 0]] = tp[0::2, 1]
            inv_light2[tp[1::2, 0]] = tp[1::2, 1]
        heavy_ids_arr = np.nonzero(n_pieces > 2)[0]
    else:
        heavy_ids_arr = np.zeros((0,), np.int64)
    if len(heavy_ids_arr):
        j_max = int(n_pieces[heavy_ids_arr].max())
        heavy_slots = np.full((len(heavy_ids_arr), j_max), total_rows, np.int64)
        hp = pairs[n_pieces[pairs[:, 0]] > 2]
        hp = hp[np.argsort(hp[:, 0], kind="stable")]
        node_rank = {n: i for i, n in enumerate(heavy_ids_arr)}
        # position of each piece within its node (sorted by node)
        counts = np.zeros(len(heavy_ids_arr), np.int64)
        ranks = np.asarray([node_rank[n] for n in hp[:, 0]])
        pos = np.zeros(len(hp), np.int64)
        for i, r in enumerate(ranks):
            pos[i] = counts[r]
            counts[r] += 1
        heavy_slots[ranks, pos] = hp[:, 1]
    else:
        heavy_slots = np.zeros((0, 1), np.int64)

    return EllLayout(
        blocks=tuple(blocks),
        inv_light=jnp.asarray(np.asarray(inv_light, np.int32)),
        heavy_ids=jnp.asarray(np.asarray(heavy_ids_arr, np.int32)),
        heavy_slots=jnp.asarray(np.asarray(heavy_slots, np.int32)),
        edge_to_slot=jnp.asarray(np.asarray(edge_to_slot, np.int32)),
        inv_light2=(
            None
            if inv_light2 is None
            else jnp.asarray(np.asarray(inv_light2, np.int32))
        ),
        num_rows_total=int(total_rows),
        num_nodes=int(num_nodes),
        num_edges=int(num_edges),
    )
