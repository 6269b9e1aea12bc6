"""Graph data containers.

:class:`Data` is the equivalent of the reference's ``graph::Data``
(include/graph.h:53-100, src/graph.cpp:77-129): node features ``x`` [N, F],
COO ``edge_index`` [2, E], optional ``edge_attr``, labels ``y``, and
train/val/test boolean masks (reference ``set_mask``, src/graph.cpp:130-151).
Ctor invariants mirror the reference's checks (src/graph.cpp:77-100).

:class:`Batch` realizes the capability the reference stubs out as
``DataBatch`` (include/graph.h:104-109, empty ctor): multiple graphs merged
into one block-diagonal graph with node offsets, plus a ``graph_id`` vector
for per-graph readout — the standard way to batch variable graphs under
static XLA shapes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gnn_tpu.graphs.adjacency import Adjacency, build_adjacency
from gnn_tpu.graphs.convert import to_dense_adj
from gnn_tpu.graphs import transforms
from gnn_tpu.nn.module import Module, static_field
from gnn_tpu.utils.checks import check_edge_index

__all__ = ["Data", "Batch", "TRAIN", "VAL", "TEST"]

TRAIN, VAL, TEST = "train", "val", "test"  # mask names (reference graph.h:14-19)


class Data(Module):
    x: Optional[jax.Array]  # [N, F] node features
    edge_index: jax.Array  # [2, E] COO
    edge_attr: Optional[jax.Array]  # [E] or [E, D]
    y: Optional[jax.Array]  # [N] or [N, ...] labels
    train_mask: Optional[jax.Array]  # [N] bool
    val_mask: Optional[jax.Array]
    test_mask: Optional[jax.Array]
    num_nodes: int = static_field(default=0)

    def __init__(
        self,
        x=None,
        edge_index=None,
        edge_attr=None,
        y=None,
        *,
        num_nodes: Optional[int] = None,
        train_mask=None,
        val_mask=None,
        test_mask=None,
        host_arrays: bool = False,
    ):
        """``host_arrays=True`` keeps every array as host numpy (no device
        transfer) — the papers100M regime where x (and the edge list) exceed
        HBM; pair with ``train.host_features`` / graphs.streaming, which
        sample and gather on the host. All shape/invariant checks still
        run."""
        if edge_index is None:
            edge_index = jnp.zeros((2, 0), jnp.int32)
        if host_arrays:
            edge_index = np.asarray(edge_index)
        else:
            edge_index = jnp.asarray(edge_index)
        check_edge_index(edge_index)
        if num_nodes is None:
            if x is not None:
                num_nodes = int(x.shape[0])
            elif edge_index.size:
                num_nodes = int(edge_index.max()) + 1
            else:
                num_nodes = 0
        # Invariant checks (reference Data ctor, src/graph.cpp:77-100).
        if edge_index.size and not isinstance(edge_index, jax.core.Tracer):
            lo, hi = int(edge_index.min()), int(edge_index.max())
            if lo < 0 or hi >= num_nodes:
                raise ValueError(
                    f"edge_index references node {hi if hi >= num_nodes else lo} "
                    f"but num_nodes={num_nodes}"
                )
        if x is not None and x.shape[0] != num_nodes:
            raise ValueError(
                f"x has {x.shape[0]} rows but num_nodes={num_nodes}"
            )
        if edge_attr is not None and edge_attr.shape[0] != edge_index.shape[1]:
            raise ValueError(
                f"edge_attr has {edge_attr.shape[0]} entries for "
                f"{edge_index.shape[1]} edges"
            )
        if y is not None and y.shape[0] not in (num_nodes, 1):
            raise ValueError(f"y has {y.shape[0]} entries for {num_nodes} nodes")
        for name, m in (
            ("train_mask", train_mask),
            ("val_mask", val_mask),
            ("test_mask", test_mask),
        ):
            if m is not None and m.shape[0] != num_nodes:
                raise ValueError(f"{name} has {m.shape[0]} entries for {num_nodes} nodes")
        if host_arrays:
            # numpy views, zero device bytes; int32 node ids are asserted
            # HERE (mirroring EdgeStream's int-width audit) — num_nodes past
            # 2^31 would silently wrap in the cast below otherwise.
            if num_nodes > np.iinfo(np.int32).max:
                raise ValueError(
                    f"num_nodes={num_nodes} exceeds int32 — host-array node "
                    "ids would overflow; shard the node space first"
                )
            self.x = None if x is None else np.asarray(x)
            self.edge_index = np.asarray(edge_index, np.int32)
            self.edge_attr = None if edge_attr is None else np.asarray(edge_attr)
            self.y = None if y is None else np.asarray(y)
            self.train_mask = None if train_mask is None else np.asarray(train_mask, bool)
            self.val_mask = None if val_mask is None else np.asarray(val_mask, bool)
            self.test_mask = None if test_mask is None else np.asarray(test_mask, bool)
        else:
            self.x = None if x is None else jnp.asarray(x)
            self.edge_index = edge_index.astype(jnp.int32)
            self.edge_attr = None if edge_attr is None else jnp.asarray(edge_attr)
            self.y = None if y is None else jnp.asarray(y)
            self.train_mask = None if train_mask is None else jnp.asarray(train_mask, bool)
            self.val_mask = None if val_mask is None else jnp.asarray(val_mask, bool)
            self.test_mask = None if test_mask is None else jnp.asarray(test_mask, bool)
        self.num_nodes = num_nodes

    @property
    def num_edges(self) -> int:
        return int(self.edge_index.shape[1])

    @property
    def num_features(self) -> int:
        return 0 if self.x is None else int(self.x.shape[-1])

    def set_mask(self, mask, split: str) -> "Data":
        """Functional equivalent of Data::set_mask (src/graph.cpp:130-151)."""
        if split not in (TRAIN, VAL, TEST):
            raise ValueError(f"split must be one of {TRAIN}/{VAL}/{TEST}, got {split}")
        return self.replace(**{f"{split}_mask": jnp.asarray(mask, bool)})

    def to_adjacency(
        self,
        *,
        add_self_loops: bool = True,
        norm: Optional[str] = "sym",
        improved: bool = False,
        reorder=False,
        **build_kwargs,
    ) -> Adjacency:
        """One-time prep: COO -> normalized CSR Adjacency for the kernels.

        Replaces the reference's on-the-fly ``Data::to_adj`` densification
        (src/graph.cpp:118-129) with O(E) CSR construction + exact gcn_norm.

        ``reorder`` (True/'auto') builds the combine-free sorted layout;
        ``reorder='cluster'`` the community-packed block-diagonal one (extra
        knobs — ``block_rows``, ``block_dtype``, ... — pass through to
        :func:`~gnn_tpu.graphs.adjacency.build_adjacency`). Either way the
        adjacency then speaks a relabeled node space — pair it with
        ``permute_nodes(adj.perm)`` to move the Data arrays over.
        """
        ei = np.asarray(self.edge_index)
        ew = None if self.edge_attr is None else np.asarray(self.edge_attr)
        if ew is not None and ew.ndim > 1:
            ew = None  # vector-valued edge attrs are features, not weights
        if norm in ("sym", "rw", "row"):
            ei, w = transforms.gcn_norm(
                ei,
                ew,
                self.num_nodes,
                self_loops=add_self_loops,
                improved=improved,
                norm=norm,
            )
            return build_adjacency(
                ei,
                jnp.asarray(w),
                num_nodes=self.num_nodes,
                reorder=reorder,
                **build_kwargs,
            )
        if add_self_loops:
            ei, ew = transforms.add_remaining_self_loops(ei, ew, num_nodes=self.num_nodes)
        return build_adjacency(
            ei,
            None if ew is None else jnp.asarray(ew),
            num_nodes=self.num_nodes,
            reorder=reorder,
            **build_kwargs,
        )

    def permute_nodes(self, perm) -> "Data":
        """Relabel nodes so new id i = old id ``perm[i]`` (perm: new -> old).

        GNNs are permutation-equivariant, so training on the permuted Data
        is exact; used with ``to_adjacency(reorder=True)``, whose sorted
        layout requires features in its relabeled space (``adj.perm``)."""
        perm = np.asarray(perm, np.int64)
        old2new = np.empty(self.num_nodes, np.int64)
        old2new[perm] = np.arange(self.num_nodes)
        take = lambda a: None if a is None else jnp.asarray(np.asarray(a)[perm])
        return self.replace(
            x=take(self.x),
            y=take(self.y),
            train_mask=take(self.train_mask),
            val_mask=take(self.val_mask),
            test_mask=take(self.test_mask),
            edge_index=jnp.asarray(
                old2new[np.asarray(self.edge_index)].astype(np.int32)
            ),
        )

    def to_dense_adj(self) -> jax.Array:
        """Dense [N, N] (tests/small graphs only; reference Data::to_adj)."""
        return to_dense_adj(self.edge_index, self.edge_attr, self.num_nodes)

    def to_dist_graph(
        self,
        *,
        mesh,
        halo: str = "alltoall",
        axis_name: str = "data",
        add_self_loops: bool = True,
        norm: Optional[str] = "sym",
        improved: bool = False,
        local_blocked: int = 0,
        block_dtype=None,
    ):
        """Multi-chip counterpart of :meth:`to_adjacency`: the same
        normalization prep, then a node partition over the mesh's
        ``axis_name`` axis (see parallel.partition_graph).
        ``local_blocked=R`` bakes each chip's local intra-window edges into
        dense MXU blocks (requires halo='overlap'; pair with a
        ``graphs.cluster_order(..., pack_rows=R)`` relabeling first)."""
        from gnn_tpu.parallel.partition import partition_graph

        ei = np.asarray(self.edge_index)
        ew = None if self.edge_attr is None else np.asarray(self.edge_attr)
        if ew is not None and ew.ndim > 1:
            ew = None
        if norm in ("sym", "rw", "row"):
            ei, ew = transforms.gcn_norm(
                ei,
                ew,
                self.num_nodes,
                self_loops=add_self_loops,
                improved=improved,
                norm=norm,
            )
        elif add_self_loops:
            ei, ew = transforms.add_remaining_self_loops(
                ei, ew, num_nodes=self.num_nodes
            )
        return partition_graph(
            ei,
            ew,
            num_nodes=self.num_nodes,
            mesh=mesh,
            axis_name=axis_name,
            halo=halo,
            local_blocked=local_blocked,
            block_dtype=block_dtype,
        )


class Batch(Data):
    """Block-diagonal merge of multiple graphs (the reference's unimplemented
    ``DataBatch``, include/graph.h:104-109)."""

    graph_id: jax.Array = None  # [N_total] int32: which graph each node is from
    num_graphs: int = static_field(default=0)

    def __init__(self, data_list: Sequence[Data]):
        if not data_list:
            raise ValueError("Batch requires at least one graph")
        xs, eis, eas, ys, gids = [], [], [], [], []
        offset = 0
        for i, d in enumerate(data_list):
            if d.x is not None:
                xs.append(np.asarray(d.x))
            eis.append(np.asarray(d.edge_index) + offset)
            if d.edge_attr is not None:
                eas.append(np.asarray(d.edge_attr))
            if d.y is not None:
                ys.append(np.atleast_1d(np.asarray(d.y)))
            gids.append(np.full(d.num_nodes, i, np.int32))
            offset += d.num_nodes
        super().__init__(
            x=jnp.asarray(np.concatenate(xs)) if xs else None,
            edge_index=jnp.asarray(np.concatenate(eis, axis=1)),
            edge_attr=jnp.asarray(np.concatenate(eas)) if eas else None,
            y=jnp.asarray(np.concatenate(ys)) if ys else None,
            num_nodes=offset,
        )
        self.graph_id = jnp.asarray(np.concatenate(gids))
        self.num_graphs = len(data_list)
