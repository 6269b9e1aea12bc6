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

__all__ = ["spmm_dist", "shard_node_array"]


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
        n_parts = dist.num_parts

        def exchange_rem(v_local, send_idx):
            return _exchange(v_local, send_idx, axis_name, n_parts)

        @jax.custom_vjp
        def local(x_local, ell, rem, t_ell, t_rem, send_idx, t_send_idx):
            recv = exchange_rem(x_local, send_idx)  # issued first: overlaps
            out = _ell_matvec(_strip(ell), x_local)  # ...with this
            return out + _ell_matvec(_strip(rem), recv)

        def local_fwd(x_local, ell, rem, t_ell, t_rem, send_idx, t_send_idx):
            return (
                local(x_local, ell, rem, t_ell, t_rem, send_idx, t_send_idx),
                (t_ell, t_rem, t_send_idx),
            )

        def local_bwd(res, g):
            t_ell, t_rem, t_send_idx = res
            recv = exchange_rem(g, t_send_idx)
            dx = _ell_matvec(_strip(t_ell), g) + _ell_matvec(
                _strip(t_rem), recv
            )
            return dx, None, None, None, None, None, None

        local.defvjp(local_fwd, local_bwd)

        fn = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis_name, None),) + (P(axis_name),) * 6,
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


def shard_node_array(
    dist: DistGraph, x, mesh: Mesh, *, axis_name: str = "data", fill=0
):
    """Pad a [N, ...] node array into the [P*n_max, ...] layout and place it
    row-sharded over the mesh."""
    x_sh = dist.shard_nodes(jnp.asarray(x), fill=fill)
    spec = P(axis_name, *([None] * (x_sh.ndim - 1)))
    return jax.device_put(x_sh, NamedSharding(mesh, spec))
