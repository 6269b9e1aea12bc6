"""Minibatch neighbor sampling — TPU-native, static-shape, on-device.

Capability target: GraphSAGE minibatch training (BASELINE.json config #3).
The reference has no sampling (its DataBatch is an empty stub,
include/graph.h:104-109).

Design: classic GraphSAGE sampling *with replacement* at fixed fanout. That
choice makes every shape static:

* hop l has exactly ``batch * prod(fanouts[:l])`` destination nodes;
* every destination draws exactly ``fanout`` neighbors (its own id when it
  has no in-neighbors), so the bipartite block structure — row_ptr, src
  positions, dst ids — is a compile-time CONSTANT shared by all batches.
  Only the flat node-id vector changes per batch.

Consequences: the whole sampler is jnp (gathers + PRNG) and runs inside the
same jitted train step as the model — no host round-trip, no per-batch
recompilation, and it shards over a 'data' mesh axis like any other array
program. Mean aggregation over fixed-fanout with-replacement draws is the
standard unbiased GraphSAGE estimator.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gnn_tpu.graphs.adjacency import Adjacency, build_adjacency

__all__ = ["NeighborSampler", "sample_neighbors"]


def sample_neighbors(
    key: jax.Array,
    row_ptr: jax.Array,
    col: jax.Array,
    seeds: jax.Array,
    fanout: int,
) -> jax.Array:
    """Uniform with-replacement draw of ``fanout`` in-neighbors per seed.
    Zero-degree seeds sample themselves. Returns [S, fanout] node ids."""
    start = jnp.take(row_ptr, seeds)
    deg = jnp.take(row_ptr, seeds + 1) - start
    u = jax.random.uniform(key, (seeds.shape[0], fanout))
    offs = jnp.floor(u * jnp.maximum(deg, 1)[:, None]).astype(jnp.int32)
    nbr = jnp.take(col, start[:, None] + offs)
    return jnp.where(deg[:, None] > 0, nbr, seeds[:, None])


def _hop_adjacency(n_dst: int, fanout: int) -> Adjacency:
    """The constant bipartite adjacency of one sampled hop.

    Node list convention: [dst nodes (prefix) | sampled neighbors, row-major
    by dst]. Edge e = (src position n_dst + d*fanout + j  ->  dst d).
    Unweighted: the layer's own aggregator (e.g. SAGE mean) normalizes."""
    E = n_dst * fanout
    dst = np.repeat(np.arange(n_dst), fanout)
    src = n_dst + np.arange(E)
    return build_adjacency(
        np.stack([src, dst]),
        None,
        num_src_nodes=n_dst + E,
        num_dst_nodes=n_dst,
        layout="csr",
    )


class NeighborSampler:
    """Layered sampler producing (node_ids, adjs) per batch.

    >>> sampler = NeighborSampler(data, fanouts=[10, 5])
    >>> nodes, adjs = sampler.sample(key, seed_nodes)   # jit-able
    >>> out = sage.forward_sampled(x[nodes], adjs)      # [batch, C]

    ``adjs`` is outermost-first: adjs[0] aggregates the deepest sampled
    frontier into the hop-1 frontier; adjs[-1] aggregates into the seeds.
    All adjacency structure is precomputed and constant; ``sample`` only
    computes node ids (pure jnp, safe inside jit).
    """

    def __init__(self, data_or_edge_index, fanouts: Sequence[int], *, num_nodes=None):
        from gnn_tpu.graphs.data import Data

        if isinstance(data_or_edge_index, Data):
            ei = np.asarray(data_or_edge_index.edge_index)
            num_nodes = data_or_edge_index.num_nodes
        else:
            ei = np.asarray(data_or_edge_index)
            if num_nodes is None:
                num_nodes = int(ei.max()) + 1 if ei.size else 0
        self.fanouts = list(fanouts)
        self.num_nodes = num_nodes
        # CSR over incoming edges (aggregate over in-neighbors, matching
        # full-graph message passing direction).
        src, dst = ei[0].astype(np.int64), ei[1].astype(np.int64)
        order = np.lexsort((src, dst))
        src, dst = src[order], dst[order]
        row_ptr = np.zeros(num_nodes + 1, np.int64)
        np.add.at(row_ptr, dst + 1, 1)
        self.row_ptr = jnp.asarray(np.cumsum(row_ptr), jnp.int32)
        self.col = jnp.asarray(src, jnp.int32)
        self._adj_cache = {}

    def adjacencies(self, batch_size: int) -> List[Adjacency]:
        """The constant per-hop bipartite adjacencies, outermost first."""
        if batch_size not in self._adj_cache:
            # hop l (innermost = aggregates into seeds) has n_dst = frontier
            # size before expansion. ensure_compile_time_eval: these are
            # compile-time constants even when first requested inside a
            # shard_map trace (where fresh jnp arrays would otherwise be
            # tracers of that trace, poisoning the cache for later calls).
            with jax.ensure_compile_time_eval():
                adjs = []
                n_dst = batch_size
                for f in self.fanouts:
                    adjs.append(_hop_adjacency(n_dst, f))
                    n_dst = n_dst * (1 + f)
            self._adj_cache[batch_size] = adjs[::-1]  # outermost first
        return self._adj_cache[batch_size]

    def sample(
        self, key: jax.Array, seeds: jax.Array
    ) -> Tuple[jax.Array, List[Adjacency]]:
        """Per-batch node ids + the constant adjacencies. jnp-pure."""
        seeds = jnp.asarray(seeds, jnp.int32)
        frontier = seeds
        keys = jax.random.split(key, len(self.fanouts))
        for f, k in zip(self.fanouts, keys):
            nbrs = sample_neighbors(k, self.row_ptr, self.col, frontier, f)
            # node list: [frontier | neighbors row-major] — matches the
            # _hop_adjacency src position convention.
            frontier = jnp.concatenate([frontier, nbrs.reshape(-1)])
        return frontier, self.adjacencies(int(seeds.shape[0]))
