"""Graph partitioning for multi-chip message passing.

The reference has no distributed capability (SURVEY.md §2: every parallelism
row "Absent"). This module implements the graph-domain analog of context/
sequence parallelism: a 1-D partition of nodes over the mesh's ``data``
axis. Each chip owns a contiguous range of nodes, the in-edges of its owned
nodes (for the forward SpMM), and the out-edges of its owned nodes (for the
backward dx = A^T g — partitioned by source owner so the backward pass is
ALSO a purely local reduction after the halo exchange).

Everything is padded to identical per-chip shapes (XLA static-shape rule):
node count to ``n_max``, ELL bucket rows to per-bucket maxima. Padding rows
gather row 0 with weight 0 and are never referenced by the combine maps, so
they cost bandwidth but never correctness.

The partitioned node layout is ``[P, n_max]``: global node g lives at
``(owner(g), g - offset(owner))``. Features/labels/masks are repartitioned
into this layout once (:meth:`DistGraph.shard_nodes`) and every layer stays
in it — no gather/scatter at layer boundaries.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gnn_tpu.graphs.ell import EllBlock, EllLayout, build_ell
from gnn_tpu.nn.module import Module, static_field

__all__ = ["DistGraph", "partition_graph"]


def _np(x):
    return np.asarray(x)


def _pad_stack_ells(ells: Sequence[EllLayout], n_max: int) -> EllLayout:
    """Stack per-chip ELL layouts into one pytree with leading axis P."""
    P = len(ells)
    # Union of bucket widths, ascending.
    ks = sorted({b.k for e in ells for b in e.blocks})
    blocks = []
    for k in ks:
        per_part = []
        for e in ells:
            match = [b for b in e.blocks if b.k == k]
            per_part.append(match[0] if match else None)
        nb_max = max(1, max(0 if b is None else b.col.shape[0] for b in per_part))
        cols = np.zeros((P, nb_max, k), np.int32)
        ws = np.zeros((P, nb_max, k), np.float32)
        rows = np.full((P, nb_max), n_max, np.int32)  # n_max = dropped write
        s2e = np.zeros((P, nb_max, k), np.int32)
        for p, b in enumerate(per_part):
            if b is None:
                continue
            nb = b.col.shape[0]
            cols[p, :nb] = _np(b.col)
            ws[p, :nb] = _np(b.w)
            rows[p, :nb] = _np(b.rows)
            s2e[p, :nb] = _np(b.slot_to_edge)
        blocks.append(
            EllBlock(
                col=jnp.asarray(cols),
                slot_to_edge=jnp.asarray(s2e),
                rows=jnp.asarray(rows),
                w=jnp.asarray(ws),
                k=int(k),
            )
        )
    r_max = max(e.num_rows_total for e in ells)
    inv_light = np.full((P, n_max), r_max, np.int64)
    # Per-part row ids must be remapped into the common padded part-row space.
    # Part-row ids are bucket-local offsets summed in bucket order; after
    # padding, bucket b starts at sum of previous buckets' nb_max. Rebuild
    # the maps from scratch instead of remapping: simpler and safe.
    h_max = max(1, max(int(e.heavy_ids.shape[0]) for e in ells))
    j_max = max(1, max(int(e.heavy_slots.shape[1]) for e in ells))
    heavy_ids = np.full((P, h_max), n_max, np.int64)  # n_max = dropped write
    heavy_slots_arr = None  # filled after row remap below

    # Build old->new part-row id remapping per part.
    new_offsets = {}
    off = 0
    for k, blk in zip(ks, blocks):
        new_offsets[k] = off
        off += blk.col.shape[1]
    r_total_new = off

    heavy_slots_arr = np.full((P, h_max, j_max), r_total_new, np.int64)
    inv_light2 = (
        np.full((P, n_max), r_total_new, np.int64)
        if any(e.inv_light2 is not None for e in ells)
        else None
    )
    for p, e in enumerate(ells):
        old_off = 0
        remap = np.full(e.num_rows_total + 1, r_total_new, np.int64)
        for b in e.blocks:
            nb = b.col.shape[0]
            remap[old_off : old_off + nb] = new_offsets[b.k] + np.arange(nb)
            old_off += nb
        inv = _np(e.inv_light).astype(np.int64)
        inv_light[p, : inv.shape[0]] = remap[np.minimum(inv, e.num_rows_total)]
        if inv_light2 is not None and e.inv_light2 is not None:
            iv2 = _np(e.inv_light2).astype(np.int64)
            inv_light2[p, : iv2.shape[0]] = remap[
                np.minimum(iv2, e.num_rows_total)
            ]
        h = int(e.heavy_ids.shape[0])
        if h:
            heavy_ids[p, :h] = _np(e.heavy_ids)
            hs = _np(e.heavy_slots).astype(np.int64)
            heavy_slots_arr[p, :h, : hs.shape[1]] = remap[
                np.minimum(hs, e.num_rows_total)
            ]

    e_max = max(e.num_edges for e in ells)
    e2s = np.zeros((P, max(1, e_max)), np.int64)
    for p, e in enumerate(ells):
        v = _np(e.edge_to_slot)
        e2s[p, : v.shape[0]] = v

    return EllLayout(
        blocks=tuple(blocks),
        inv_light=jnp.asarray(inv_light, jnp.int32),
        heavy_ids=jnp.asarray(heavy_ids, jnp.int32),
        heavy_slots=jnp.asarray(heavy_slots_arr, jnp.int32),
        edge_to_slot=jnp.asarray(e2s, jnp.int32),
        inv_light2=(
            None if inv_light2 is None else jnp.asarray(inv_light2, jnp.int32)
        ),
        num_rows_total=int(r_total_new),
        num_nodes=int(n_max),
        num_edges=int(e_max),
    )


class DistGraph(Module):
    """Node-partitioned graph: per-chip ELL structures with leading axis P.

    ``ell``: in-edges of owned nodes (forward); column ids index the padded
    GLOBAL layout [P * n_max] (v1 halo = all-gather).
    ``t_ell``: out-edges of owned nodes (backward dx), same convention.

    Edge-parallel extension (``edge_parallel=True``, the default): per-chip
    FLAT edge arrays in the local dst-sorted order — ``esrc_coord`` (source
    position in the chip's halo-buffer layout), ``edst_row`` (owned dst row,
    ``n_max`` for padding) — plus ``inc``, an *incidence* ELL that reduces
    per-edge vectors by source buffer coordinate. Together these give every
    dynamic-per-edge-weight layer (GAT attention, SAGE max, generic
    ``spmm_edge_weighted``) a scatter-free distributed path: gather-src is a
    flat take out of the exchanged buffer, and its VJP is the incidence
    reduction followed by a reverse all_to_all of the remote partials.
    """

    ell: EllLayout
    t_ell: EllLayout
    send_idx: Optional[jax.Array]  # [P, P, H] rows chip p sends to chip q
    t_send_idx: Optional[jax.Array]  # same for the backward (cotangents)
    # halo='overlap' only: per-chip edges split by source owner so the
    # local aggregation runs concurrently with the all_to_all in flight.
    ell_rem: Optional[EllLayout] = None  # remote-source in-edges (recv coords)
    t_ell_rem: Optional[EllLayout] = None  # same for backward
    # halo='overlap' + local_blocked=R only: [P, B, R, R] block-diagonal
    # values of each chip's LOCAL intra-window edges (B = n_max // R).
    # Forward aggregates them on the MXU (einsum) instead of gather slots;
    # the backward dense operator is the same tensor with the window axes
    # transposed, so no separate transpose blocks are stored (see
    # parallel/halo.py). These edges are EXCLUDED from ell/t_ell.
    diag: Optional[jax.Array] = None
    # Edge-parallel arrays (None when edge_parallel=False):
    esrc_coord: Optional[jax.Array] = None  # [P, E_max] i32, pad -> n_buf
    edst_row: Optional[jax.Array] = None  # [P, E_max] i32, pad -> n_max
    inc: Optional[EllLayout] = None  # reduce edge vectors by src buffer coord
    in_degree: Optional[jax.Array] = None  # [P, n_max] f32 in-degree of owned
    edge_id: Optional[jax.Array] = None  # [P, E_max] i32 input-order edge id,
    # pad -> global num_edges (feeds shard_edge_array's zero slot)
    num_parts: int = static_field(default=1)
    # with_weight(None) on a weight-baked partition: route spmm through the
    # dynamic edge-parallel path with unit weights (see with_weight below).
    unit_weight: bool = static_field(default=False)
    n_max: int = static_field(default=0)  # owned nodes per chip (padded)
    num_nodes: int = static_field(default=0)  # true global node count
    mesh: object = static_field(default=None)  # jax.sharding.Mesh (hashable)
    axis_name: str = static_field(default="data")
    halo: str = static_field(default="allgather")  # or "alltoall"
    block_rows: int = static_field(default=0)  # R of the local diag blocks
    h_max: int = static_field(default=0)  # padded per-pair halo size
    e_max: int = static_field(default=0)  # padded per-chip edge count
    has_weight: bool = static_field(default=False)  # baked edge weights?

    @property
    def n_buf(self) -> int:
        """Per-chip halo-buffer length the edge ``esrc_coord``s index into:
        [own rows | recv slots] for the targeted modes, the padded global
        layout for 'allgather'."""
        if self.halo in ("alltoall", "overlap"):
            return self.n_max + self.num_parts * self.h_max
        return self.num_parts * self.n_max

    def with_weight(self, weight) -> "DistGraph":
        """Adjacency-protocol compatibility (graphs/adjacency.py:96) so
        layers that strip the baked edge weights — GIN's unweighted sum,
        ``spmm(adj.with_weight(None), x)`` — run unchanged on a DistGraph.

        ``weight=None`` only. If the partition was built WITHOUT edge
        weights the ELL slots are already 1.0 and this is the identity; if
        weights were baked in, the returned view routes ``spmm`` through the
        dynamic edge-parallel path with unit weights (ones at real edges,
        zeros at padding slots) — correct but slower than the static ELLs,
        so partition without ``edge_weight`` when every layer is unweighted.
        Replacing weights post-partition is not supported: static weights
        are baked into the ELL slot tables at build time."""
        if weight is not None:
            raise ValueError(
                "DistGraph.with_weight supports only None (unit weights); "
                "per-edge weights are baked at partition_graph time — "
                "rebuild the partition, or use spmm_edge_weighted for "
                "differentiable weights"
            )
        if not self.has_weight:
            return self
        if self.esrc_coord is None:
            raise ValueError(
                "with_weight(None) on a weight-baked DistGraph needs the "
                "edge-parallel arrays: partition_graph(..., "
                "edge_parallel=True)"
            )
        return self.replace(unit_weight=True)

    def shard_edge_array(self, w, fill=0) -> jax.Array:
        """Map a per-edge array given in partition_graph's INPUT edge order
        to the [P*E_max, ...] local dst-sorted edge layout that the
        edge-parallel ops consume (padding slots -> ``fill``)."""
        if self.edge_id is None:
            raise ValueError("built with edge_parallel=False")
        w = jnp.asarray(w)
        ext = jnp.concatenate(
            [w, jnp.full((1,) + w.shape[1:], fill, w.dtype)], axis=0
        )
        return jnp.take(ext, self.edge_id.reshape(-1), axis=0)

    def shard_nodes(self, x: jax.Array, fill=0) -> jax.Array:
        """Repartition a [N, ...] node array into padded [P * n_max, ...]."""
        N = self.num_nodes
        pad_total = self.num_parts * self.n_max - N
        if x.ndim == 1:
            pad = jnp.full((pad_total,), fill, x.dtype)
        else:
            pad = jnp.full((pad_total, *x.shape[1:]), fill, x.dtype)
        return jnp.concatenate([x, pad], axis=0)

    def unshard_nodes(self, x_sh: jax.Array) -> jax.Array:
        """Inverse of shard_nodes (drop padding rows)."""
        return x_sh[: self.num_nodes]


def _halo_plan(cols_per_part, P, n_max):
    """For the targeted exchange: per-(receiver, owner) sorted lists of the
    remote rows each chip needs, a common padded size H, the [P, P, H]
    send tables, per-part column remappers into the local buffer layout
    [own rows (n_max) | recv slot per peer (H each)], and the raw ``need``
    tables (used by the overlap mode's local/remote edge split)."""
    need = [[None] * P for _ in range(P)]
    h = 8
    for p, cols in enumerate(cols_per_part):
        own = np.minimum(cols // n_max, P - 1)
        for q in range(P):
            if q == p:
                need[p][q] = np.zeros(0, np.int64)
                continue
            need[p][q] = np.unique(cols[own == q])
            h = max(h, len(need[p][q]))
    h = ((h + 7) // 8) * 8
    send = np.zeros((P, P, h), np.int64)  # send[owner, receiver]
    for p in range(P):
        for q in range(P):
            if q == p:
                continue
            rows = need[p][q] - q * n_max  # local on owner q
            send[q, p, : len(rows)] = rows

    def remap(p, cols):
        out = np.empty(len(cols), np.int64)
        own = np.minimum(cols // n_max, P - 1)
        for q in range(P):
            m = own == q
            if q == p:
                out[m] = cols[m] - p * n_max
            else:
                pos = np.searchsorted(need[p][q], cols[m])
                out[m] = n_max + q * h + pos
        return out

    return send, h, remap, need


def partition_graph(
    edge_index,
    edge_weight=None,
    *,
    num_nodes: int,
    num_parts: Optional[int] = None,
    mesh=None,
    axis_name: str = "data",
    halo: str = "allgather",
    edge_parallel: bool = True,
    local_blocked: int = 0,
    block_dtype=None,
) -> DistGraph:
    """Partition a COO graph by contiguous node ranges over ``num_parts``.

    With the padded layout, owner(g) = g // n_max where
    n_max = ceil(N / P) rounded up to a multiple of 8 (TPU sublane tiling).

    ``halo``: 'allgather' replicates all features per layer (simple, fine
    within one ICI slice); 'alltoall' exchanges only the boundary rows each
    chip actually needs (the DCN-scale strategy) — edge columns are then
    remapped into the per-chip buffer layout [own | per-peer recv slots];
    'overlap' is 'alltoall' with the per-chip edges additionally split into
    local-source and remote-source ELLs, so the local aggregation overlaps
    with the exchange in flight (double buffering via XLA's latency-hiding
    scheduler).

    ``edge_parallel``: also build the flat per-edge arrays + incidence ELL
    that dynamic-per-edge-weight layers (GAT, SAGE-max, spmm_edge_weighted)
    need; costs roughly one more E-sized int array set.

    ``local_blocked`` (requires halo='overlap'): window size R > 0 bakes
    each chip's local intra-window edges (src//R == dst//R in local
    coordinates) into dense [B, R, R] diagonal blocks aggregated on the MXU
    — the distributed extension of the single-chip cluster-packed layout
    (graphs/blocked.py), sidestepping the per-edge gather wall for the
    community-captured fraction. Pair with a community-packing node order
    (``graphs.cluster_order(..., pack_rows=R)``) BEFORE partitioning so the
    windows actually capture communities; without it the blocks are mostly
    empty and only cost HBM reads. ``block_dtype`` (e.g. jnp.bfloat16)
    halves the block read at ~0.4% weight rounding. Static weights only.
    """
    if num_parts is None:
        if mesh is None:
            raise ValueError("pass num_parts or a mesh")
        num_parts = mesh.shape[axis_name]
    if halo not in ("allgather", "alltoall", "overlap"):
        raise ValueError(f"unknown halo mode '{halo}'")
    ei = np.asarray(edge_index)
    src, dst = ei[0].astype(np.int64), ei[1].astype(np.int64)
    w = None if edge_weight is None else np.asarray(edge_weight, np.float32)
    P = int(num_parts)
    R_blk = int(local_blocked)
    if R_blk:
        if halo != "overlap":
            raise ValueError(
                "local_blocked requires halo='overlap' (the mode with a "
                "local/remote edge split)"
            )
        if R_blk % 8:
            raise ValueError("local_blocked must be a multiple of 8")
    n_max = -(-num_nodes // P)
    # Align owned ranges: to the window size when blocking (so per-chip
    # windows tile n_max exactly), to the sublane count otherwise.
    align = R_blk if R_blk else 8
    n_max = ((n_max + align - 1) // align) * align

    # Collect per-part sorted local edge lists first.
    gidx = np.arange(len(src), dtype=np.int64)
    fwd_parts, bwd_parts, fwd_ids = [], [], []
    for p in range(P):
        lo, hi = p * n_max, min((p + 1) * n_max, num_nodes)
        m = (dst >= lo) & (dst < hi)  # forward: in-edges of owned dst
        s_p, d_p = src[m], dst[m] - lo
        w_p = None if w is None else w[m]
        order = np.lexsort((s_p, d_p))
        fwd_parts.append(
            (s_p[order], d_p[order], None if w_p is None else w_p[order])
        )
        fwd_ids.append(gidx[m][order])
        m = (src >= lo) & (src < hi)  # backward: out-edges of owned src
        s_p, d_p = src[m] - lo, dst[m]  # A^T: row = src, col = dst
        w_p = None if w is None else w[m]
        order = np.lexsort((d_p, s_p))
        bwd_parts.append(
            (d_p[order], s_p[order], None if w_p is None else w_p[order])
        )

    send_idx = t_send_idx = None
    h_max = 0
    need_f = need_b = None
    if halo in ("alltoall", "overlap"):
        send_f, h_f, remap_f, need_f = _halo_plan(
            [c for c, _, _ in fwd_parts], P, n_max
        )
        send_b, h_b, remap_b, need_b = _halo_plan(
            [c for c, _, _ in bwd_parts], P, n_max
        )
        h_max = max(h_f, h_b)
        # Re-plan with a common H so both directions share buffer geometry.
        if h_f != h_max:
            send_f = np.pad(send_f, ((0, 0), (0, 0), (0, h_max - h_f)))
        if h_b != h_max:
            send_b = np.pad(send_b, ((0, 0), (0, 0), (0, h_max - h_b)))

        def scale(remap, h_dir):
            # remap used n_max + q*h_dir + pos; convert to common h_max
            def f(p, cols):
                out = remap(p, cols)
                is_halo = out >= n_max
                q = (out - n_max) // h_dir
                pos = (out - n_max) % h_dir
                out = np.where(is_halo, n_max + q * h_max + pos, out)
                return out

            return f

        remap_f = scale(remap_f, h_f)
        remap_b = scale(remap_b, h_b)
        send_idx = jnp.asarray(np.asarray(send_f, np.int32))
        t_send_idx = jnp.asarray(np.asarray(send_b, np.int32))
        n_src_coord = n_max + P * h_max
    else:
        remap_f = remap_b = lambda p, cols: cols  # padded-global coords
        n_src_coord = P * n_max

    def _build_part(cols_mapped, rows, w_p):
        row_ptr = np.zeros(n_max + 1, np.int64)
        np.add.at(row_ptr, rows + 1, 1)
        row_ptr = np.cumsum(row_ptr)
        return build_ell(
            row_ptr,
            cols_mapped,
            np.arange(len(cols_mapped)),
            n_max,
            len(cols_mapped),
            edge_weight=w_p,
        )

    ell_rem = t_ell_rem = None
    if halo == "overlap":
        # Split each chip's edges by source owner: local-source edges
        # aggregate from x_local (no communication), remote-source edges
        # aggregate from the all_to_all recv buffer (coords q*h_max + pos).
        # The two ELL matvecs are independent of each other, so XLA's
        # latency-hiding scheduler runs the local one while the exchange
        # is in flight.
        def remote_remap(need, p, cols):
            out = np.empty(len(cols), np.int64)
            own = np.minimum(cols // n_max, P - 1)
            for q in range(P):
                m = own == q
                if m.any():
                    out[m] = q * h_max + np.searchsorted(need[p][q], cols[m])
            return out

        fl, fr, bl, br = [], [], [], []
        if R_blk:
            B_blk = n_max // R_blk
            diag_np = np.zeros((P, B_blk, R_blk, R_blk), np.float32)
        for p in range(P):
            for parts, need, loc_out, rem_out, is_fwd in (
                (fwd_parts, need_f, fl, fr, True),
                (bwd_parts, need_b, bl, br, False),
            ):
                cols, rows, w_p = parts[p]
                m = np.minimum(cols // n_max, P - 1) == p
                lc, lr = cols[m] - p * n_max, rows[m]
                lw = None if w_p is None else w_p[m]
                if R_blk:
                    # Intra-window local edges go to the dense diagonal
                    # blocks (forward accumulates them; the backward dense
                    # operator is the transposed blocks — same edge set,
                    # since both endpoints are owned, so nothing to build).
                    dn = lc // R_blk == lr // R_blk
                    if is_fwd and dn.any():
                        np.add.at(
                            diag_np[p].reshape(-1),
                            (lr[dn] // R_blk) * R_blk * R_blk
                            + (lr[dn] % R_blk) * R_blk
                            + (lc[dn] % R_blk),
                            1.0 if lw is None else lw[dn],
                        )
                    keep = ~dn
                    lc, lr = lc[keep], lr[keep]
                    lw = None if lw is None else lw[keep]
                loc_out.append(_build_part(lc, lr, lw))
                r = ~m
                rem_out.append(
                    _build_part(
                        remote_remap(need, p, cols[r]),
                        rows[r],
                        None if w_p is None else w_p[r],
                    )
                )
        fwd_ells, bwd_ells = fl, bl
        ell_rem = _pad_stack_ells(fr, n_max)
        t_ell_rem = _pad_stack_ells(br, n_max)
    else:
        fwd_ells, bwd_ells = [], []
        for p in range(P):
            for parts, remap, out in (
                (fwd_parts, remap_f, fwd_ells),
                (bwd_parts, remap_b, bwd_ells),
            ):
                cols, rows, w_p = parts[p]
                out.append(_build_part(remap(p, cols), rows, w_p))

    # Edge-parallel arrays: flat per-edge views of the SAME fwd partition
    # (local dst-sorted order) in the halo-buffer coordinate space, plus the
    # incidence ELL that reduces per-edge vectors by source coordinate (the
    # scatter-free backward of gather_src_dist — see parallel/halo.py).
    esrc_coord = edst_row = inc = in_degree = edge_id = None
    e_max = 0
    if edge_parallel:
        n_buf = n_max + P * h_max if halo in ("alltoall", "overlap") else P * n_max
        e_max = max(1, max(len(c) for c, _, _ in fwd_parts))
        e_max = ((e_max + 7) // 8) * 8
        esrc_np = np.full((P, e_max), n_buf, np.int32)  # pad -> zero row
        edst_np = np.full((P, e_max), n_max, np.int32)  # pad -> dropped
        eid_np = np.full((P, e_max), len(src), np.int32)  # pad -> fill slot
        deg_np = np.zeros((P, n_max), np.float32)
        incs = []
        for p in range(P):
            cols, rows, _ = fwd_parts[p]
            ep = len(cols)
            mapped = np.asarray(remap_f(p, cols), np.int64)
            esrc_np[p, :ep] = mapped
            edst_np[p, :ep] = rows
            eid_np[p, :ep] = fwd_ids[p]
            np.add.at(deg_np[p], rows, 1.0)
            order = np.argsort(mapped, kind="stable")
            rp = np.zeros(n_buf + 1, np.int64)
            np.add.at(rp, mapped + 1, 1)
            rp = np.cumsum(rp)
            # cols of the incidence ELL are LOCAL EDGE IDS (they gather rows
            # of an [E_max, F] per-edge array), emitted in coord-sorted order.
            incs.append(build_ell(rp, order, order, n_buf, ep))
        esrc_coord = jnp.asarray(esrc_np)
        edst_row = jnp.asarray(edst_np)
        edge_id = jnp.asarray(eid_np)
        in_degree = jnp.asarray(deg_np)
        inc = _pad_stack_ells(incs, n_buf)

    diag = None
    if R_blk:
        diag = jnp.asarray(diag_np)
        if block_dtype is not None:
            diag = diag.astype(block_dtype)
    return DistGraph(
        ell=_pad_stack_ells(fwd_ells, n_max),
        t_ell=_pad_stack_ells(bwd_ells, n_max),
        send_idx=send_idx,
        t_send_idx=t_send_idx,
        ell_rem=ell_rem,
        t_ell_rem=t_ell_rem,
        diag=diag,
        esrc_coord=esrc_coord,
        edst_row=edst_row,
        inc=inc,
        in_degree=in_degree,
        edge_id=edge_id,
        num_parts=P,
        n_max=int(n_max),
        num_nodes=int(num_nodes),
        mesh=mesh,
        axis_name=axis_name,
        halo=halo,
        block_rows=R_blk,
        h_max=int(h_max),
        e_max=int(e_max),
        has_weight=edge_weight is not None,
    )
