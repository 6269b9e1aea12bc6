"""Host-streamed edge shards — the papers100M-scale aggregation path.

ogbn-papers100M (111M nodes, 1.6B edges) cannot hold its edge structure in
one chip's HBM next to activations. This module keeps the graph HOST-
resident and streams fixed-size edge chunks through the chip, accumulating
the aggregation output range by range (SURVEY.md §7 hard part (d);
BASELINE.md "ogbn-papers100M: edges/s scaling").

Design:

* edges are sorted by destination once on the host (the same canonical
  order as :class:`~gnn_tpu.graphs.adjacency.Adjacency`), then cut into
  chunks of a fixed ``chunk_edges`` size — ONE compiled program serves every
  chunk (static shapes);
* each chunk touches a contiguous destination range [d_lo, d_hi); the
  device step gathers x by the chunk's sources, segment-sums into the
  chunk-local range, and accumulates into the output slab with a dynamic
  slice-add. Only O(chunk + range) device memory beyond x/out;
* chunk boundaries may split a destination's edge list; the slice-add
  accumulation makes that harmless (partial sums add up);
* per-chip: each chip owns a destination range and streams only its own
  chunk sequence — compose with parallel.partition for the mesh layout.

Int-width audit (E can exceed 2^31 at this scale): host offsets
(``row_ptr``-like cuts) are int64 throughout; device-side indices are
chunk-LOCAL (< chunk_edges) and node ids (< N < 2^31 for papers100M), so
int32 on device is safe and is asserted at build time.
"""

from __future__ import annotations

import math
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["EdgeStream", "streaming_spmm"]

_INT32_MAX = np.iinfo(np.int32).max


class EdgeStream:
    """Host-resident dst-sorted edge list cut into fixed-size chunks.

    Accepts numpy arrays or np.memmap (for graphs bigger than RAM the
    caller memmaps the .npy files; sorting is then the loader's job).
    """

    def __init__(
        self,
        edge_index,
        edge_weight=None,
        *,
        num_nodes: int,
        chunk_edges: int = 1 << 22,
        assume_sorted: bool = False,
    ):
        src = np.asarray(edge_index[0])
        dst = np.asarray(edge_index[1])
        if num_nodes > _INT32_MAX:
            raise ValueError(
                f"num_nodes={num_nodes} exceeds int32 — device node ids "
                "would overflow; shard the node space first"
            )
        # E may exceed 2^31: all host-side offsets are int64 by construction.
        self.num_edges = int(src.shape[0])
        self.num_nodes = int(num_nodes)
        self.chunk_edges = int(chunk_edges)
        if not assume_sorted:
            order = np.argsort(dst, kind="stable")  # int64 positions
            src, dst = src[order], dst[order]
            if edge_weight is not None:
                edge_weight = np.asarray(edge_weight)[order]
        else:
            if self.num_edges and np.any(np.diff(dst) < 0):
                raise ValueError("assume_sorted=True but dst is not sorted")
        self.src = np.ascontiguousarray(src, np.int32)
        self.dst = np.ascontiguousarray(dst, np.int32)
        self.weight = (
            None
            if edge_weight is None
            else np.ascontiguousarray(edge_weight, np.float32)
        )
        self.num_chunks = max(1, math.ceil(self.num_edges / self.chunk_edges))
        # Fixed destination-range span per chunk so ONE jitted step serves
        # all chunks: the worst chunk's dst span, padded to sublane multiple.
        spans = []
        for c in range(self.num_chunks):
            lo = c * self.chunk_edges  # int (python, unbounded) — E > 2^31 ok
            hi = min(lo + self.chunk_edges, self.num_edges)
            spans.append(int(self.dst[hi - 1]) - int(self.dst[lo]) + 1 if hi > lo else 1)
        self.range_rows = ((max(spans) + 7) // 8) * 8

    def chunks(self) -> Iterator[Tuple[np.ndarray, np.ndarray, Optional[np.ndarray], int]]:
        """Yield (src_chunk, dst_local_chunk, weight_chunk, d_lo) with
        fixed shapes [chunk_edges]; padding slots carry src=0, dst_local=
        range_rows (dropped by the local segment-sum), weight=0."""
        E, C = self.num_edges, self.chunk_edges
        for c in range(self.num_chunks):
            lo, hi = c * C, min((c + 1) * C, E)
            n = hi - lo
            d_lo = int(self.dst[lo]) if n else 0
            src = np.zeros(C, np.int32)
            dstl = np.full(C, self.range_rows, np.int32)
            src[:n] = self.src[lo:hi]
            dstl[:n] = self.dst[lo:hi] - d_lo
            w = None
            if self.weight is not None:
                w = np.zeros(C, np.float32)
                w[:n] = self.weight[lo:hi]
            yield src, dstl, w, d_lo


def streaming_spmm(
    stream: EdgeStream,
    x: jax.Array,
    *,
    out_dtype=None,
) -> jax.Array:
    """out = A @ x with A streamed from the host chunk by chunk.

    Device memory: x + out + one [chunk_edges] index/weight set + the
    [chunk_edges, F] gather buffer — independent of total edge count.
    Forward-only (inference / feature propagation); training at this scale
    runs sampled minibatches (train.loop batch_size > 0), not full graph.
    """
    F = x.shape[1]
    R = stream.range_rows
    out_dtype = out_dtype or x.dtype
    out = jnp.zeros((stream.num_nodes, F), out_dtype)
    weighted = stream.weight is not None

    @jax.jit
    def step(out, x, src, dstl, w, d_lo):
        msg = jnp.take(x, src, axis=0)
        if w is not None:
            msg = msg * w[:, None]
        # Segment into the chunk-local range (+1 slot swallows padding).
        part = jax.ops.segment_sum(
            msg, dstl, R + 1, indices_are_sorted=True
        )[:R].astype(out.dtype)
        cur = jax.lax.dynamic_slice(out, (d_lo, 0), (R, F))
        return jax.lax.dynamic_update_slice(out, cur + part, (d_lo, 0))

    # Rows within R of the end would make the dynamic slice clamp and
    # misalign the range; guard by padding out once, slicing back after.
    pad = R
    out = jnp.concatenate([out, jnp.zeros((pad, F), out_dtype)], axis=0)
    for src, dstl, w, d_lo in stream.chunks():
        out = step(
            out,
            x,
            jnp.asarray(src),
            jnp.asarray(dstl),
            jnp.asarray(w) if weighted else None,
            d_lo,
        )
    return out[: stream.num_nodes]
