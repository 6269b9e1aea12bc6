"""Distributed SpMM under shard_map.

v1 halo strategy: all-gather the node features over the ``data`` axis, then
aggregate locally with the per-chip ELL (scatter-free). The backward is NOT
left to autodiff: a custom VJP computes dx with the *transpose-partitioned*
ELL (out-edges of owned nodes), so the backward is also one all-gather + a
local reduction — no reduce-scatter of scattered gradients, no cross-chip
scatter-add anywhere.

Math: out_p = A_p x  (A_p = in-edge rows of chip p's nodes)
      dx_p  = (A^T)_p g  (rows of A^T owned by p = out-edges of p's nodes)
Both sides only need the full activation/cotangent vector, which is what the
all-gather provides; contributions never cross chips after the gather.

The all-gather rides ICI; XLA's latency-hiding scheduler overlaps it with
the independent dense work around the SpMM inside the same jit. A targeted
all-to-all exchange (send only boundary rows) is the planned v2 for
DCN-scale graphs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gnn_tpu.ops.spmm import _ell_matvec
from gnn_tpu.parallel.partition import DistGraph

__all__ = [
    "spmm_dist",
    "spmm_dist_dynw",
    "gather_src_dist",
    "gather_dst_dist",
    "edge_reduce_by_dst",
    "edge_valid_mask",
    "shard_node_array",
]


def _strip(tree):
    """Remove the size-1 leading axis shard_map leaves on stacked pytrees."""
    return jax.tree_util.tree_map(lambda a: a[0], tree)


def _exchange(v_local, send_idx, axis_name, n_parts):
    """The targeted-halo exchange core (shared by the 'alltoall' and
    'overlap' modes and by both forward and backward directions): gather the
    rows each peer needs, all_to_all them, return the [P*H, F] recv buffer
    (peer q's rows occupy block q — the coordinate space the remapped edge
    columns index as ``n_max + q*h_max + pos``)."""
    send = jnp.take(v_local, send_idx[0], axis=0)  # [P, H, F]
    if n_parts == 1:
        recv = send
    else:
        recv = jax.lax.all_to_all(
            send, axis_name, split_axis=0, concat_axis=0, tiled=False
        )
    return recv.reshape(-1, v_local.shape[1])


def spmm_dist(
    dist: DistGraph,
    x_sh: jax.Array,
    mesh: Mesh,
    *,
    axis_name: str = "data",
) -> jax.Array:
    """out = A @ x over the mesh. ``x_sh``: [P*n_max, F] in the padded
    node layout (see DistGraph.shard_nodes), sharded P('data', None)."""
    if x_sh.ndim != 2:
        raise ValueError(f"spmm_dist expects [P*n_max, F], got {x_sh.shape}")

    if dist.halo == "overlap":
        # v3: targeted all_to_all + local/remote edge split. The local ELL
        # matvec reads only x_local and is independent of the collective, so
        # XLA's latency-hiding scheduler runs it while the exchange is in
        # flight; the remote ELL then consumes the recv buffer directly
        # (coords q*h_max + pos — no concat with x_local needed).
        #
        # With local_blocked=R (dist.diag is not None), each chip's local
        # intra-window edges additionally ride the MXU as a [B, R, R] x
        # [B, R, F] batched matmul — the distributed form of the single-chip
        # cluster-packed layout (graphs/blocked.py). The backward dense
        # operator is the SAME blocks with window axes transposed (both
        # endpoints are owned, so the forward and backward local dense edge
        # sets coincide): einsum('brc,brf->bcf', diag, g).
        n_parts = dist.num_parts
        use_blocked = dist.diag is not None
        diag_in = (
            dist.diag
            if use_blocked
            else jnp.zeros((n_parts, 1, 8, 8), jnp.float32)
        )

        def exchange_rem(v_local, send_idx):
            return _exchange(v_local, send_idx, axis_name, n_parts)

        def _dense(d, v, spec):
            """Per-window dense matvec: spec 'brw,bwf->brf' (forward) or
            'brc,brf->bcf' (transpose/backward)."""
            B, R, _ = d.shape
            vw = v.reshape(B, R, v.shape[1]).astype(d.dtype)
            out = jnp.einsum(spec, d, vw, preferred_element_type=jnp.float32)
            return out.reshape(v.shape).astype(v.dtype)

        @jax.custom_vjp
        def local(x_local, ell, rem, t_ell, t_rem, send_idx, t_send_idx, diag):
            recv = exchange_rem(x_local, send_idx)  # issued first: overlaps
            out = _ell_matvec(_strip(ell), x_local)  # ...with this
            if use_blocked:
                out = out + _dense(diag[0], x_local, "brw,bwf->brf")
            return out + _ell_matvec(_strip(rem), recv)

        def local_fwd(x_local, ell, rem, t_ell, t_rem, send_idx, t_send_idx, diag):
            return (
                local(
                    x_local, ell, rem, t_ell, t_rem, send_idx, t_send_idx, diag
                ),
                (t_ell, t_rem, t_send_idx, diag),
            )

        def local_bwd(res, g):
            t_ell, t_rem, t_send_idx, diag = res
            recv = exchange_rem(g, t_send_idx)
            dx = _ell_matvec(_strip(t_ell), g) + _ell_matvec(
                _strip(t_rem), recv
            )
            if use_blocked:
                dx = dx + _dense(diag[0], g, "brc,brf->bcf")
            return dx, None, None, None, None, None, None, None

        local.defvjp(local_fwd, local_bwd)

        fn = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis_name, None),) + (P(axis_name),) * 7,
            out_specs=P(axis_name, None),
            axis_names={axis_name},
        )
        return fn(
            x_sh,
            dist.ell,
            dist.ell_rem,
            dist.t_ell,
            dist.t_ell_rem,
            dist.send_idx,
            dist.t_send_idx,
            diag_in,
        )

    if dist.halo == "alltoall":
        n_parts = dist.num_parts

        def exchange(v_local, send_idx):
            """Targeted halo: send each peer exactly the rows it needs, and
            lay the recv buffer after the owned rows ([own | recv])."""
            recv = _exchange(v_local, send_idx, axis_name, n_parts)
            return jnp.concatenate([v_local, recv], axis=0)

        @jax.custom_vjp
        def local(x_local, ell, t_ell, send_idx, t_send_idx):
            return _ell_matvec(_strip(ell), exchange(x_local, send_idx))

        def local_fwd(x_local, ell, t_ell, send_idx, t_send_idx):
            return local(x_local, ell, t_ell, send_idx, t_send_idx), (
                ell,
                t_ell,
                send_idx,
                t_send_idx,
            )

        def local_bwd(res, g):
            ell, t_ell, send_idx, t_send_idx = res
            dx = _ell_matvec(_strip(t_ell), exchange(g, t_send_idx))
            return dx, None, None, None, None

        local.defvjp(local_fwd, local_bwd)

        fn = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P(axis_name, None),
                P(axis_name),
                P(axis_name),
                P(axis_name),
                P(axis_name),
            ),
            out_specs=P(axis_name, None),
            axis_names={axis_name},
        )
        return fn(x_sh, dist.ell, dist.t_ell, dist.send_idx, dist.t_send_idx)

    @jax.custom_vjp
    def local(x_local, ell, t_ell):
        x_full = jax.lax.all_gather(x_local, axis_name, tiled=True)
        return _ell_matvec(_strip(ell), x_full)

    def local_fwd(x_local, ell, t_ell):
        return local(x_local, ell, t_ell), (ell, t_ell)

    def local_bwd(res, g):
        ell, t_ell = res
        g_full = jax.lax.all_gather(g, axis_name, tiled=True)
        dx = _ell_matvec(_strip(t_ell), g_full)
        return dx, None, None

    local.defvjp(local_fwd, local_bwd)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name), P(axis_name)),
        out_specs=P(axis_name, None),
        # Only the graph-partition axis is manual; any other mesh axes
        # (e.g. a tensor-parallel 'model' axis) stay under GSPMD control.
        axis_names={axis_name},
    )
    return fn(x_sh, dist.ell, dist.t_ell)


# -- edge-parallel primitives (dynamic per-edge weights over the mesh) ------
#
# The static-weight SpMM above covers GCN/GIN, whose aggregation weights are
# frozen into the partition. GAT (attention) and SAGE-max need *runtime*
# per-edge values; these primitives give them a scatter-free distributed
# path built on the DistGraph's edge-parallel arrays (partition.py):
#
#   gather_src_dist    x[P*n_max,F] -> per-edge src features [P*E_max,F]
#                      (fwd: halo exchange + flat take; bwd: incidence-ELL
#                      reduction by source coordinate + reverse all_to_all
#                      of the remote partials back to their owners)
#   gather_dst_dist    per-owned-node values -> per-edge dst values (local)
#   edge_reduce_by_dst per-edge values -> per-owned-dst sum/max (local —
#                      forward edges live with their destination's owner)
#   spmm_dist_dynw     out = A(w) @ x with differentiable per-edge w
#
# Per-edge arrays use each chip's LOCAL dst-sorted edge order, concatenated
# chip-major into [P*E_max, ...]; padding edges (edst_row == n_max) carry
# zero rows and drop out of every reduction.


def _require_edge_parallel(dist: DistGraph):
    if dist.esrc_coord is None or dist.inc is None:
        raise ValueError(
            "DistGraph was built with edge_parallel=False; rebuild with "
            "partition_graph(..., edge_parallel=True) for dynamic-weight ops"
        )
    if dist.mesh is None:
        raise ValueError("DistGraph has no mesh: partition_graph(..., mesh=mesh)")


def edge_valid_mask(dist: DistGraph) -> jax.Array:
    """[P*E_max] bool — True for real edges, False for padding slots."""
    _require_edge_parallel(dist)
    return (dist.edst_row != dist.n_max).reshape(-1)


def _full_buffer(x_local, send_idx, axis_name, n_parts, targeted):
    """The per-chip halo buffer the remapped edge coords index into:
    [own rows | recv slots] for targeted modes, tiled all-gather otherwise."""
    if targeted:
        return jnp.concatenate(
            [x_local, _exchange(x_local, send_idx, axis_name, n_parts)], axis=0
        )
    return jax.lax.all_gather(x_local, axis_name, tiled=True)


def gather_src_dist(dist: DistGraph, x_sh: jax.Array) -> jax.Array:
    """Per-edge source features over the mesh.

    ``x_sh``: [P*n_max, F] in the padded node layout. Returns [P*E_max, F]
    in each chip's local dst-sorted edge order (padding edges -> zeros).

    Custom VJP (the reason this exists): the cotangent reduction by source
    never scatters — per-edge cotangents reduce through the incidence ELL
    into halo-buffer coordinates, and the remote-coordinate partials ride
    the REVERSE all_to_all back to their owners (or a psum_scatter in
    allgather mode). This is the distributed generalization of the
    reference's gather/scatter Slice pair (operation.h:575-616)."""
    _require_edge_parallel(dist)
    if x_sh.ndim != 2:
        raise ValueError(f"gather_src_dist expects [P*n_max, F], got {x_sh.shape}")
    mesh, axis_name = dist.mesh, dist.axis_name
    targeted = dist.halo in ("alltoall", "overlap")
    n_parts, n_max, h_max = dist.num_parts, dist.n_max, dist.h_max
    send_idx = dist.send_idx
    if send_idx is None:  # allgather mode has no send tables
        send_idx = jnp.zeros((n_parts, 1, 1), jnp.int32)
    in_dtype = x_sh.dtype

    @jax.custom_vjp
    def local(x_local, esrc, inc, sidx):
        buf = _full_buffer(x_local, sidx, axis_name, n_parts, targeted)
        buf = jnp.concatenate(
            [buf, jnp.zeros((1, buf.shape[1]), buf.dtype)], axis=0
        )
        return jnp.take(buf, esrc[0], axis=0)

    def local_fwd(x_local, esrc, inc, sidx):
        return local(x_local, esrc, inc, sidx), (inc, sidx)

    def local_bwd(res, g):
        inc, sidx = res
        partials = _ell_matvec(_strip(inc), g)  # [n_buf, F], scatter-free
        if targeted:
            dx = partials[:n_max]
            rem = partials[n_max:].reshape(n_parts, h_max, g.shape[1])
            if n_parts > 1:
                rem = jax.lax.all_to_all(
                    rem, axis_name, split_axis=0, concat_axis=0, tiled=False
                )
            # Partials at unpopulated send slots are exactly 0, so the padded
            # send rows (value 0) only ever add zeros to row 0.
            dx = dx.at[sidx[0].reshape(-1)].add(
                rem.reshape(-1, g.shape[1]), mode="drop"
            )
        else:
            dx = jax.lax.psum_scatter(
                partials, axis_name, scatter_dimension=0, tiled=True
            )
        return dx.astype(in_dtype), None, None, None

    local.defvjp(local_fwd, local_bwd)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name, None),) + (P(axis_name),) * 3,
        out_specs=P(axis_name, None),
        axis_names={axis_name},
    )
    return fn(x_sh, dist.esrc_coord, dist.inc, send_idx)


def gather_dst_dist(dist: DistGraph, u_sh: jax.Array) -> jax.Array:
    """Per-edge values of each edge's (locally owned) destination:
    [P*n_max, F] -> [P*E_max, F]. Purely local; differentiable (the VJP is
    a small [E_max -> n_max] sorted scatter of width F)."""
    _require_edge_parallel(dist)

    def local(u_local, edst):
        u_ext = jnp.concatenate(
            [u_local, jnp.zeros((1, u_local.shape[1]), u_local.dtype)], axis=0
        )
        return jnp.take(u_ext, edst[0], axis=0)

    fn = jax.shard_map(
        local,
        mesh=dist.mesh,
        in_specs=(P(dist.axis_name, None), P(dist.axis_name)),
        out_specs=P(dist.axis_name, None),
        axis_names={dist.axis_name},
    )
    return fn(u_sh, dist.edst_row)


def edge_reduce_by_dst(
    dist: DistGraph, v_sh: jax.Array, *, op: str = "sum"
) -> jax.Array:
    """Reduce per-edge values to their destination nodes: [P*E_max, F] ->
    [P*n_max, F]. Local per chip (the forward partition keys edges by dst
    owner); edges are dst-sorted so the reduction is a sorted segment op.
    ``op``: 'sum' or 'max' ('max' leaves -inf on in-degree-0 rows — mask at
    the caller, e.g. with ``dist.in_degree``)."""
    _require_edge_parallel(dist)
    if op not in ("sum", "max"):
        raise ValueError(f"unknown edge reduction '{op}'")
    n_max = dist.n_max

    def local(v_local, edst):
        ids = edst[0]
        if op == "sum":
            out = jax.ops.segment_sum(
                v_local, ids, n_max + 1, indices_are_sorted=True
            )
        else:
            out = jax.ops.segment_max(
                v_local, ids, n_max + 1, indices_are_sorted=True
            )
        return out[:n_max]  # row n_max collected the padding edges

    fn = jax.shard_map(
        local,
        mesh=dist.mesh,
        in_specs=(P(dist.axis_name, None), P(dist.axis_name)),
        out_specs=P(dist.axis_name, None),
        axis_names={dist.axis_name},
    )
    return fn(v_sh, dist.edst_row)


def spmm_dist_dynw(
    dist: DistGraph, weight_sh: jax.Array, x_sh: jax.Array
) -> jax.Array:
    """out = A(w) @ x over the mesh with *differentiable* per-edge weights.

    ``weight_sh``: [P*E_max] in the chips' local dst-sorted edge order
    (padding slots must be 0 — see :func:`edge_valid_mask`). The dynamic
    analog of :func:`spmm_dist`; backward dx rides gather_src_dist's
    incidence-ELL VJP and dw is a local per-edge SDDMM via autodiff."""
    msgs = gather_src_dist(dist, x_sh) * weight_sh[:, None].astype(x_sh.dtype)
    return edge_reduce_by_dst(dist, msgs, op="sum")


def shard_node_array(
    dist: DistGraph, x, mesh: Mesh, *, axis_name: str = "data", fill=0
):
    """Pad a [N, ...] node array into the [P*n_max, ...] layout and place it
    row-sharded over the mesh."""
    x_sh = dist.shard_nodes(jnp.asarray(x), fill=fill)
    spec = P(axis_name, *([None] * (x_sh.ndim - 1)))
    return jax.device_put(x_sh, NamedSharding(mesh, spec))
