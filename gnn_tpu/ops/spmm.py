"""Sparse matrix x dense matrix multiply (SpMM) — the hot op.

This is what the reference's aggregation actually is: it densifies the
adjacency and runs ``adj.mm(x)`` per layer (reference: src/graph.cpp:204-212,
the "SpMM in disguise" of SURVEY.md §3.1). Here it is a real SpMM over the
CSR :class:`~gnn_tpu.graphs.adjacency.Adjacency`:

    out[d] = sum over in-edges e=(s -> d) of w_e * x[s]

Forward: gather rows of x by edge source, scale by edge weight, sorted
segment-sum by destination. Backward (custom VJP, replacing the reference's
hand-written MatMul backward operation.h:504-534):

    dx = A^T g      — same SpMM against the pre-built transpose structure,
                       so the backward scatter is ALSO a sorted reduction;
    dw = SDDMM(g, x) per edge: <g[dst], x[src]>.

Backends: "segment" (pure XLA; gather + segment_sum fuse into a single
scatter-add loop over HBM) and "pallas" (row-chunked VMEM kernel, see
gnn_tpu.ops.pallas.spmm). "auto" picks per platform.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from gnn_tpu.graphs.adjacency import Adjacency
from gnn_tpu.ops.segment import segment_sum

__all__ = ["spmm", "spmm_coo", "spmm_edge_weighted"]


# -- core XLA path ----------------------------------------------------------


def _spmm_fwd_impl(x, weight, src, dst, n_dst):
    msg = jnp.take(x, src, axis=0)
    if weight is not None:
        msg = msg * weight[:, None].astype(msg.dtype)
    return segment_sum(msg, dst, n_dst, indices_are_sorted=True)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _spmm(n_src: int, n_dst: int, x, weight, src, dst, t_perm):
    return _spmm_fwd_impl(x, weight, src, dst, n_dst)


def _spmm_fwd(n_src, n_dst, x, weight, src, dst, t_perm):
    out = _spmm_fwd_impl(x, weight, src, dst, n_dst)
    return out, (x, weight, src, dst, t_perm)


def _spmm_bwd(n_src, n_dst, res, g):
    x, weight, src, dst, t_perm = res
    # dx[s] = sum_{e=(s->d)} w_e * g[d]  — transpose SpMM, sorted by src.
    gmsg = jnp.take(g, dst, axis=0)
    if weight is not None:
        gmsg = gmsg * weight[:, None].astype(gmsg.dtype)
    dx = segment_sum(
        jnp.take(gmsg, t_perm, axis=0),
        jnp.take(src, t_perm),
        n_src,
        indices_are_sorted=True,
    ).astype(x.dtype)
    if weight is None:
        dw = None
    else:
        # dw_e = <g[dst_e], x[src_e]> — an SDDMM.
        dw = jnp.sum(
            jnp.take(g, dst, axis=0) * jnp.take(x, src, axis=0), axis=-1
        ).astype(weight.dtype)
    return dx, dw, None, None, None


_spmm.defvjp(_spmm_fwd, _spmm_bwd)


# -- ELL fast path (scatter-free; see graphs/ell.py for the rationale) ------


def _ell_matvec(ell, x, weight=None):
    """out[n] = sum over n's ELL slots of w_slot * x[col_slot]. No scatter:
    per-bucket gather + dense reduction, then a permutation gather for the
    per-node combine (tiny fix-up for split heavy nodes).

    ``weight=None`` uses the slot weights baked into the layout (the fast
    path — a runtime per-slot scalar gather costs as much as the row gather
    itself). Passing a per-edge ``weight`` re-gathers slots dynamically; use
    only for differentiable weights."""
    F = x.shape[1]
    parts = []
    if weight is not None:
        w_ext = jnp.concatenate([weight, jnp.zeros((1,), weight.dtype)])
    for blk in ell.blocks:
        w_slot = blk.w if weight is None else jnp.take(w_ext, blk.slot_to_edge)
        g = jnp.take(x, blk.col, axis=0)  # [Nb, K, F]
        parts.append(
            jnp.sum(w_slot[:, :, None] * g, axis=1, dtype=jnp.float32).astype(
                x.dtype
            )
        )
    flat = jnp.concatenate(parts + [jnp.zeros((1, F), x.dtype)], axis=0)
    out = jnp.take(flat, ell.inv_light, axis=0)
    if ell.inv_light2 is not None:
        # 2-piece remainder covers (graphs/ell.py): one extra N-row gather
        # (1-piece nodes hit the zero row) — still no scatter.
        out = out + jnp.take(flat, ell.inv_light2, axis=0)
    if int(ell.heavy_ids.shape[0]):
        heavy = jnp.sum(jnp.take(flat, ell.heavy_slots, axis=0), axis=1)
        out = out.at[ell.heavy_ids].set(heavy)
    return out


def _ell_edge_grad(ell, g_out, x):
    """dw_e = <g[dst_e], x[src_e]> in ELL form (an SDDMM), mapped back to
    canonical edge order by a gather (never a scatter)."""
    parts = []
    for blk in ell.blocks:
        g_rows = jnp.take(g_out, blk.rows, axis=0)  # [Nb, F]
        xg = jnp.take(x, blk.col, axis=0)  # [Nb, K, F]
        parts.append(
            jnp.einsum(
                "nf,nkf->nk", g_rows, xg, preferred_element_type=jnp.float32
            ).reshape(-1)
        )
    flat = jnp.concatenate(parts)
    return jnp.take(flat, ell.edge_to_slot)


# -- cluster-blocked fast path; see graphs/blocked.py ------------------------


@jax.custom_vjp
def _spmm_blocked(x, lay, t_lay):
    """Static-weight SpMM over the cluster-packed block-diagonal layout:
    intra-community edges aggregate as one batched MXU matmul, the
    inter-community remainder rides the one-hot segment-sum kernel."""
    from gnn_tpu.graphs.blocked import blocked_matvec

    return blocked_matvec(lay, x)


def _spmm_blocked_fwd(x, lay, t_lay):
    return _spmm_blocked(x, lay, t_lay), (lay, t_lay)


def _spmm_blocked_bwd(res, g):
    from gnn_tpu.graphs.blocked import blocked_matvec

    lay, t_lay = res
    return blocked_matvec(t_lay, g), None, None


_spmm_blocked.defvjp(_spmm_blocked_fwd, _spmm_blocked_bwd)


# -- sorted (combine-free) fast path; see graphs/sorted_ell.py ---------------


@jax.custom_vjp
def _spmm_sorted(x, lay, t_lay):
    """Static-weight SpMM over the contiguous degree-bucket layout: output
    is concat(bucket parts) in node order — no combine gathers at all."""
    from gnn_tpu.graphs.sorted_ell import sorted_ell_matvec

    return sorted_ell_matvec(lay, x)


def _spmm_sorted_fwd(x, lay, t_lay):
    return _spmm_sorted(x, lay, t_lay), (lay, t_lay)


def _spmm_sorted_bwd(res, g):
    from gnn_tpu.graphs.sorted_ell import sorted_ell_matvec

    lay, t_lay = res
    return sorted_ell_matvec(t_lay, g), None, None


_spmm_sorted.defvjp(_spmm_sorted_fwd, _spmm_sorted_bwd)


@jax.custom_vjp
def _spmm_sorted_dynw(x, weight, lay, t_lay):
    from gnn_tpu.graphs.sorted_ell import sorted_ell_matvec

    return sorted_ell_matvec(lay, x, weight)


def _spmm_sorted_dynw_fwd(x, weight, lay, t_lay):
    return _spmm_sorted_dynw(x, weight, lay, t_lay), (x, weight, lay, t_lay)


def _spmm_sorted_dynw_bwd(res, g):
    from gnn_tpu.graphs.sorted_ell import (
        sorted_ell_edge_grad,
        sorted_ell_matvec,
    )

    x, weight, lay, t_lay = res
    dx = sorted_ell_matvec(t_lay, g, weight).astype(x.dtype)
    dw = sorted_ell_edge_grad(lay, g, x).astype(weight.dtype)
    return dx, dw, None, None


_spmm_sorted_dynw.defvjp(_spmm_sorted_dynw_fwd, _spmm_sorted_dynw_bwd)


@jax.custom_vjp
def _spmm_ell(x, ell, t_ell):
    """Static-weight ELL SpMM: differentiates x only (the adjacency's
    weights — e.g. frozen GCN norm — are treated as constants)."""
    return _ell_matvec(ell, x)


def _spmm_ell_fwd(x, ell, t_ell):
    return _ell_matvec(ell, x), (ell, t_ell)


def _spmm_ell_bwd(res, g):
    ell, t_ell = res
    return _ell_matvec(t_ell, g), None, None


_spmm_ell.defvjp(_spmm_ell_fwd, _spmm_ell_bwd)


@jax.custom_vjp
def _spmm_ell_dynw(x, weight, ell, t_ell):
    """Dynamic-weight ELL SpMM: differentiates x AND the per-edge weight."""
    return _ell_matvec(ell, x, weight)


def _spmm_ell_dynw_fwd(x, weight, ell, t_ell):
    return _ell_matvec(ell, x, weight), (x, weight, ell, t_ell)


def _spmm_ell_dynw_bwd(res, g):
    x, weight, ell, t_ell = res
    dx = _ell_matvec(t_ell, g, weight).astype(x.dtype)
    dw = _ell_edge_grad(ell, g, x).astype(weight.dtype)
    return dx, dw, None, None


_spmm_ell_dynw.defvjp(_spmm_ell_dynw_fwd, _spmm_ell_dynw_bwd)


def spmm_edge_weighted(
    adj: Adjacency, weight: jax.Array, x: jax.Array
) -> jax.Array:
    """SpMM with caller-supplied *differentiable* per-edge weights (in the
    adjacency's canonical dst-sorted edge order) — the attention fast path.
    Falls back to the segment backend when no ELL layout is present.

    A :class:`~gnn_tpu.parallel.DistGraph` routes to the multi-chip dynamic
    path; there ``weight`` is [P*E_max] in the chips' local dst-sorted edge
    order with zeros in the padding slots (see parallel.edge_valid_mask)."""
    from gnn_tpu.parallel.partition import DistGraph

    if isinstance(adj, DistGraph):
        from gnn_tpu.parallel.halo import spmm_dist_dynw

        return spmm_dist_dynw(adj, weight, x)
    if adj.sorted_ell is not None and adj.t_sorted_ell is not None:
        return _spmm_sorted_dynw(x, weight, adj.sorted_ell, adj.t_sorted_ell)
    if adj.ell is not None and adj.t_ell is not None:
        return _spmm_ell_dynw(x, weight, adj.ell, adj.t_ell)
    return _spmm(
        adj.num_src_nodes,
        adj.num_dst_nodes,
        x,
        weight,
        adj.src,
        adj.dst,
        adj.t_perm,
    )


# -- public API -------------------------------------------------------------


def spmm(
    adj: Adjacency,
    x: jax.Array,
    *,
    backend: str = "auto",
) -> jax.Array:
    """out = A @ x with A given by ``adj`` (shape [N_dst, N_src] logically).

    Differentiable in ``x`` and ``adj.weight``.
    """
    if x.ndim != 2:
        raise ValueError(f"spmm expects x of rank 2 [N, F], got {x.shape}")
    # Distributed dispatch: a partitioned graph routes to the shard_map path,
    # so GCN/GIN layers run multi-chip without any code change (GIN's
    # unweighted sum rides DistGraph.with_weight(None) — identity on an
    # unweighted partition, the dynamic unit-weight path on a weighted one;
    # parity-tested in tests/test_parallel.py::test_dist_models_transparent).
    from gnn_tpu.parallel.partition import DistGraph

    if isinstance(adj, DistGraph):
        if adj.mesh is None:
            raise ValueError(
                "DistGraph has no mesh: partition_graph(..., mesh=mesh)"
            )
        if adj.unit_weight and adj.has_weight:
            # with_weight(None) view of a weight-baked partition: unit
            # weights at real edges, zeros at padding slots.
            from gnn_tpu.parallel.halo import edge_valid_mask, spmm_dist_dynw

            ones = edge_valid_mask(adj).astype(jnp.float32)
            return spmm_dist_dynw(adj, jax.lax.stop_gradient(ones), x)
        from gnn_tpu.parallel.halo import spmm_dist

        return spmm_dist(adj, x, adj.mesh, axis_name=adj.axis_name)
    if backend == "auto":
        if adj.blocked is not None:
            backend = "blocked"
        elif adj.sorted_ell is not None:
            backend = "sorted"
        else:
            backend = "ell" if adj.ell is not None else "segment"
    if backend == "blocked":
        if adj.blocked is None or adj.t_blocked is None:
            raise ValueError(
                "spmm backend 'blocked' needs the cluster-packed layout: "
                "build the adjacency with build_adjacency(..., "
                "reorder='cluster')"
            )
        return _spmm_blocked(x, adj.blocked, adj.t_blocked)
    if backend == "sorted":
        if adj.sorted_ell is None or adj.t_sorted_ell is None:
            raise ValueError(
                "spmm backend 'sorted' needs the reordered layout: build the "
                "adjacency with build_adjacency(..., reorder=True)"
            )
        return _spmm_sorted(x, adj.sorted_ell, adj.t_sorted_ell)
    if backend == "pallas":
        # Retired from the public dispatch (VERDICT r4 #7): measured on
        # chip against every other backend (benchmarks/spmm_backends.py,
        # docs/PERF.md round 5), the gather + one-hot-kernel CSR
        # configuration wins NO regime — 2x the XLA scatter but always
        # under the ELL layouts (48 vs 93 M edges/s at arxiv scale; even
        # at 20k nodes plain ELL wins 35 vs 30). The kernel itself still
        # backs GAT numerators and the blocked remainder, where no ELL
        # formulation applies.
        raise ValueError(
            "spmm backend 'pallas' is retired: it wins no measured regime "
            "(docs/PERF.md round 5). Use backend='auto' (ELL layouts), or "
            "import the experimental gnn_tpu.ops.pallas.spmm.spmm_pallas "
            "directly."
        )
    if backend == "ell":
        if adj.ell is None or adj.t_ell is None:
            raise ValueError(
                "spmm backend 'ell' needs an ELL layout: build the adjacency "
                "with build_adjacency(..., layout='ell')"
            )
        return _spmm_ell(x, adj.ell, adj.t_ell)
    if backend != "segment":
        raise ValueError(f"unknown spmm backend '{backend}'")
    return _spmm(
        adj.num_src_nodes,
        adj.num_dst_nodes,
        x,
        adj.weight,
        adj.src,
        adj.dst,
        adj.t_perm,
    )


def spmm_coo(
    src: jax.Array,
    dst: jax.Array,
    x: jax.Array,
    num_dst_nodes: int,
    weight: Optional[jax.Array] = None,
    *,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """One-off COO SpMM without a prepared Adjacency (autodiff via XLA's
    native gather/scatter VJPs — fine for small graphs and tests)."""
    msg = jnp.take(x, src, axis=0)
    if weight is not None:
        msg = msg * weight[:, None].astype(msg.dtype)
    return segment_sum(
        msg, dst, num_dst_nodes, indices_are_sorted=indices_are_sorted
    )
