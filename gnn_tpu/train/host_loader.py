"""Sampled-minibatch loading with HOST-resident features.

The papers100M training regime (BASELINE.json config #5): the feature
matrix (111M x 128 f32 = 57 GB) does not fit in HBM, so the device-side
:class:`~gnn_tpu.graphs.sampling.NeighborSampler` — which gathers
``x[nodes]`` from a device-resident x inside the train step — cannot be
used. This loader runs the layered fanout sampling AND the feature gather
on the HOST (native ``sample_neighbors``, graph_native.cpp; ``x`` may be an
``np.memmap``), shipping only the ``[batch_nodes, F]`` slab per step.

Sampling semantics match the device sampler exactly: uniform
with-replacement draws at fixed fanout, zero-degree seeds sample
themselves — so every shape is static and ONE jitted train step (with the
same constant bipartite hop adjacencies, ``NeighborSampler.adjacencies``)
serves every batch. Device memory per step is O(batch_nodes * F),
independent of N and E.

Capability replaced: the reference's ``DataBatch`` stub
(/root/reference/include/graph.h:104-109) — minibatching the reference
never implemented, at a scale it could never reach.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from gnn_tpu.graphs.sampling import _hop_adjacency

__all__ = ["HostBatchLoader"]


class HostBatchLoader:
    """Host-side layered neighbor sampler + feature gather.

    >>> loader = HostBatchLoader(ei, x_mm, y, fanouts=[10, 5], num_nodes=N)
    >>> feats, ys = loader.batch(seed_nodes)       # numpy, host-side
    >>> logits = model.forward_sampled(jnp.asarray(feats), loader.adjacencies(B))

    ``x``/``y`` may be np.memmap (never loaded whole); ``edge_index`` is
    CSR-ified once at build (native counting sort, O(E + N)).
    """

    def __init__(
        self,
        edge_index,
        x,
        y,
        fanouts: Sequence[int],
        *,
        num_nodes: int,
        seed: int = 0,
    ):
        from gnn_tpu import native

        ei = np.asarray(edge_index)
        src = np.ascontiguousarray(ei[0], np.int64)
        dst = np.ascontiguousarray(ei[1], np.int64)
        # CSR over incoming edges (row = dst), matching full-graph message
        # passing direction and the device sampler's convention.
        perm, row_ptr = native.sort_edges_csr(src, dst, num_nodes)
        self.row_ptr = row_ptr
        self.col = np.ascontiguousarray(src[perm])
        self.x = x
        self.y = y
        self.fanouts = list(fanouts)
        self.num_nodes = int(num_nodes)
        self._seed = int(seed)
        self._adj_cache = {}

    def adjacencies(self, batch_size: int) -> List:
        """The constant per-hop bipartite adjacencies (outermost first) —
        identical structure to NeighborSampler.adjacencies."""
        if batch_size not in self._adj_cache:
            adjs = []
            n_dst = batch_size
            for f in self.fanouts:
                adjs.append(_hop_adjacency(n_dst, f))
                n_dst = n_dst * (1 + f)
            self._adj_cache[batch_size] = adjs[::-1]
        return self._adj_cache[batch_size]

    def batch(self, seeds) -> Tuple[np.ndarray, np.ndarray]:
        """Sample one minibatch: returns (features [batch_nodes, F],
        labels [batch]). Node list layout per hop: [frontier | neighbors
        row-major], matching ``_hop_adjacency``'s source positions."""
        from gnn_tpu import native

        frontier = np.ascontiguousarray(seeds, np.int64)
        seeds = frontier
        for f in self.fanouts:
            self._seed += 1
            nbr = native.sample_neighbors_host(
                self.row_ptr,
                self.col,
                frontier,
                f,
                seed=self._seed,
                replace=True,
            )
            # zero-degree seeds: native marks slots 1.. with -1; the device
            # sampler's semantics are "sample yourself" — match them.
            nbr = np.where(nbr < 0, frontier[:, None], nbr)
            frontier = np.concatenate([frontier, nbr.reshape(-1)])
        feats = np.asarray(self.x[frontier])  # memmap-friendly fancy index
        ys = np.asarray(self.y[seeds])
        return feats, ys
