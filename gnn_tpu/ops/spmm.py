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

__all__ = ["spmm", "spmm_coo"]


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
    if backend == "auto":
        backend = "segment"
    if backend == "pallas":
        from gnn_tpu.ops.pallas.spmm import spmm_pallas

        return spmm_pallas(adj, x)
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
