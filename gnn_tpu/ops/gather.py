"""Edge gathers with scatter-free backward passes.

``x[adj.src]`` / ``x[adj.dst]`` are cheap on TPU, but their *default* VJPs
are unsorted scatter-adds — the single slowest lowering on TPU (measured
>100 ms for 2M x 128 unsorted). These wrappers give the gathers custom
VJPs that route the backward through a permute-to-sorted-order +
one-hot-matmul Pallas segment-sum (the adjacency's transpose chunk plan),
so a model built from gathers + reductions never scatters in either
direction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gnn_tpu.ops.segment import segment_sum

__all__ = ["gather_src_edges", "gather_dst_edges"]


def _pallas_ok(plan, n_rows, interpret):
    return plan is not None and (
        interpret or jax.default_backend() != "cpu"
    ) and n_rows >= plan.chunk


def _segsum_planned(flat, plan, n_out, interpret):
    """Pallas sorted segment-sum with internal lane padding."""
    from gnn_tpu.ops.pallas.segment import segment_sum_sorted

    width = flat.shape[1]
    pad = (-width) % 128
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((flat.shape[0], pad), flat.dtype)], axis=1
        )
    out = segment_sum_sorted(flat, plan, n_out, interpret=interpret)
    return out[:, :width] if pad else out


def gather_src_edges(
    x: jax.Array, adj, *, interpret: bool = False
) -> jax.Array:
    """x_j = x[adj.src] with a scatter-free VJP. x: [N_src, ...]."""

    @jax.custom_vjp
    def f(x):
        return jnp.take(x, adj.src, axis=0)

    def fwd(x):
        return f(x), x.shape

    def bwd(shape, g):
        gf = g.reshape(g.shape[0], -1)
        if getattr(adj, "t_edge_agg", None) is not None:
            # one gather: the transpose slot tables fold the permute-to-
            # src-order into the aggregation (ops/edge_agg.py)
            from gnn_tpu.ops.edge_agg import edge_aggregate

            dx = edge_aggregate(gf, adj.t_edge_agg)
        elif _pallas_ok(adj.t_chunk_plan, gf.shape[0], interpret):
            # reorder cotangents into src-sorted order, reduce on the MXU
            gp = jnp.take(gf, adj.t_perm, axis=0)
            dx = _segsum_planned(gp, adj.t_chunk_plan, adj.num_src_nodes, interpret)
        else:
            dx = segment_sum(
                jnp.take(gf, adj.t_perm, axis=0),
                jnp.take(adj.src, adj.t_perm),
                adj.num_src_nodes,
                indices_are_sorted=True,
            )
        return (dx.reshape(shape).astype(g.dtype),)

    f.defvjp(fwd, bwd)
    return f(x)


def gather_dst_edges(
    x: jax.Array, adj, *, interpret: bool = False
) -> jax.Array:
    """x_i = x[adj.dst] with a scatter-free VJP. x: [N_dst, ...]."""

    @jax.custom_vjp
    def f(x):
        return jnp.take(x, adj.dst, axis=0)

    def fwd(x):
        return f(x), x.shape

    def bwd(shape, g):
        gf = g.reshape(g.shape[0], -1)
        if getattr(adj, "edge_agg", None) is not None:
            from gnn_tpu.ops.edge_agg import edge_aggregate

            dx = edge_aggregate(gf, adj.edge_agg)
        elif _pallas_ok(adj.chunk_plan, gf.shape[0], interpret):
            dx = _segsum_planned(gf, adj.chunk_plan, adj.num_dst_nodes, interpret)
        else:
            dx = segment_sum(
                gf, adj.dst, adj.num_dst_nodes, indices_are_sorted=True
            )
        return (dx.reshape(shape).astype(g.dtype),)

    f.defvjp(fwd, bwd)
    return f(x)
