"""Host-streamed edge shards — the papers100M-scale aggregation path.

ogbn-papers100M (111M nodes, 1.6B edges) cannot hold its edge structure in
one chip's HBM next to activations — and its feature matrix (111M x 128 f32
= 57 GB) cannot either. This module keeps the graph (and optionally the
features) HOST-resident and streams fixed-size edge chunks through the
chip(s), accumulating the aggregation output range by range (SURVEY.md §7
hard part (d); BASELINE.md "ogbn-papers100M: edges/s scaling"; the
capability the reference gestures at with its empty ``DataBatch`` stub,
/root/reference/include/graph.h:104-109).

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
* the sorted chunk-local destinations ship as RUN-LENGTH COUNTS
  ([range_rows+1] i32 per chunk instead of [chunk_edges] i32) and are
  re-expanded on device with ``jnp.repeat`` — a 2x cut of the per-chunk
  transfer for the unweighted case, which matters because the stream is
  host-bandwidth-bound, not compute-bound (measured: the chip does a 4M-edge
  chunk in ~10 ms; the tunnel takes far longer to ship it);
* transfers are DOUBLE-BUFFERED: the next chunk's ``device_put`` is issued
  before the current chunk's compute is dispatched, so upload and compute
  overlap (``prefetch`` chunks in flight);
* backward: :func:`streaming_spmm_grad` streams the TRANSPOSE edge order
  (``EdgeStream.transpose()``) for dx = A^T g — training-capable streaming;
* multi-chip: :class:`DistEdgeStream` composes the stream with the 1-D node
  partition of ``parallel/partition.py`` — each chip owns a contiguous dst
  range and streams only its own shard, with source features gathered
  host-side per chunk (unique rows only) so no collective and no
  device-resident x is ever needed. P chips stream independently at P x
  aggregate host bandwidth.

Int-width audit (E can exceed 2^31 at this scale): host offsets
(``row_ptr``-like cuts) are int64 throughout; device-side indices are
chunk-LOCAL (< chunk_edges) and node ids (< N < 2^31 for papers100M), so
int32 on device is safe and is asserted at build time.
"""

from __future__ import annotations

import collections
import math
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "EdgeStream",
    "streaming_spmm",
    "streaming_spmm_grad",
    "DistEdgeStream",
]

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
        min_range_rows: int = 0,
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
        # ``min_range_rows`` lets DistEdgeStream force a common span across
        # its per-chip streams (one compiled step for the whole mesh).
        spans = [int(min_range_rows)]
        for c in range(self.num_chunks):
            lo = c * self.chunk_edges  # int (python, unbounded) — E > 2^31 ok
            hi = min(lo + self.chunk_edges, self.num_edges)
            spans.append(int(self.dst[hi - 1]) - int(self.dst[lo]) + 1 if hi > lo else 1)
        self.range_rows = ((max(spans) + 7) // 8) * 8

    def transpose(self) -> "EdgeStream":
        """The reversed-edge stream (dst-sorted by the ORIGINAL sources) —
        the structure of A^T, used by the streamed backward dx = A^T g."""
        return EdgeStream(
            np.stack([self.dst, self.src]),
            self.weight,
            num_nodes=self.num_nodes,
            chunk_edges=self.chunk_edges,
        )

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

    def chunks_rle(self) -> Iterator[Tuple[np.ndarray, np.ndarray, Optional[np.ndarray], int]]:
        """Like :meth:`chunks` but with the sorted local destinations
        run-length encoded: yields (src, counts [range_rows+1] i32, weight,
        d_lo). counts[r] = edges of local row r in this chunk; slot
        range_rows counts the padding. The device re-expands with
        ``jnp.repeat(..., total_repeat_length=chunk_edges)``."""
        R = self.range_rows
        for src, dstl, w, d_lo in self.chunks():
            counts = np.bincount(dstl, minlength=R + 1).astype(np.int32)
            yield src, counts, w, d_lo


def _rle_expand(counts: jax.Array, total: int) -> jax.Array:
    """Expand run-length counts [K] into the sorted id vector [total]
    (== jnp.repeat(arange(K), counts, total_repeat_length=total)) via
    scatter-of-boundaries + cumsum. jnp.repeat lowers to a searchsorted
    (binary search per output element — measured ~0.5 s per 4M-edge chunk
    with 420k segments); this is two bandwidth-bound passes instead.
    Boundary indices landing at ``total`` (trailing empty segments) are
    dropped by JAX scatter semantics; coincident boundaries (empty middle
    segments) accumulate, correctly skipping their ids."""
    starts = jnp.cumsum(counts)[:-1]  # exclusive prefix: segment 1.. starts
    marks = jnp.zeros((total,), jnp.int32).at[starts].add(1)
    return jnp.cumsum(marks)


def _prefetched(device_batches, prefetch: int):
    """Keep ``prefetch`` host->device transfers in flight ahead of the
    consumer. ``jnp.asarray``/``device_put`` dispatch asynchronously, so
    issuing the next chunk's transfer before the current chunk's compute
    overlaps upload with execution (the stream is transfer-bound)."""
    q = collections.deque()
    for batch in device_batches:
        q.append(batch)
        if len(q) > prefetch:
            yield q.popleft()
    while q:
        yield q.popleft()


def streaming_spmm(
    stream: EdgeStream,
    x: jax.Array,
    *,
    out_dtype=None,
    norm: Optional[jax.Array] = None,
    prefetch: int = 2,
) -> jax.Array:
    """out = A @ x with A streamed from the host chunk by chunk.

    Device memory: x + out + ``prefetch`` [chunk_edges] index/weight sets +
    the [chunk_edges, F] gather buffer — independent of total edge count.

    ``norm``: optional device-resident [num_nodes] f32 vector of per-node
    factors; per-edge weight w_e = norm[src_e] * norm[dst_e] is recomputed
    ON DEVICE (e.g. the d^-1/2 factors of gcn_norm), eliminating the
    [chunk_edges] f32 weight transfer — the stream is host-bandwidth-bound,
    so fewer bytes is directly more edges/s. Mutually exclusive with
    baked per-edge weights.

    Differentiation: this function is a host-side loop (not jittable);
    for a grad-capable streamed SpMM use :func:`streaming_spmm_grad`.
    """
    if norm is not None and stream.weight is not None:
        raise ValueError("pass either baked edge weights or norm, not both")
    F = x.shape[1]
    R = stream.range_rows
    C = stream.chunk_edges
    N = stream.num_nodes
    out_dtype = out_dtype or x.dtype
    weighted = stream.weight is not None
    use_norm = norm is not None

    @jax.jit
    def step(out, x, norm, src, counts, w, d_lo):
        # Re-expand the run-length counts into the sorted local dst ids
        # (padding slots land in segment R and are dropped below).
        dstl = _rle_expand(counts, C)
        msg = jnp.take(x, src, axis=0)
        if use_norm:
            dst_g = jnp.minimum(d_lo + dstl, N - 1)
            we = jnp.take(norm, src) * jnp.take(norm, dst_g)
            msg = msg * we[:, None].astype(msg.dtype)
        elif w is not None:
            msg = msg * w[:, None].astype(msg.dtype)
        part = jax.ops.segment_sum(
            msg, dstl, R + 1, indices_are_sorted=True
        )[:R].astype(out.dtype)
        cur = jax.lax.dynamic_slice(out, (d_lo, 0), (R, F))
        return jax.lax.dynamic_update_slice(out, cur + part, (d_lo, 0))

    # Rows within R of the end would make the dynamic slice clamp and
    # misalign the range; guard by padding out once, slicing back after.
    out = jnp.zeros((N + R, F), out_dtype)

    def to_device():
        for src, counts, w, d_lo in stream.chunks_rle():
            yield (
                jnp.asarray(src),
                jnp.asarray(counts),
                jnp.asarray(w) if weighted else None,
                d_lo,
            )

    for src, counts, w, d_lo in _prefetched(to_device(), prefetch):
        out = step(out, x, norm, src, counts, w, d_lo)
    return out[:N]


def streaming_spmm_grad(
    stream: EdgeStream,
    t_stream: EdgeStream,
    x: jax.Array,
    *,
    norm: Optional[jax.Array] = None,
    prefetch: int = 2,
) -> jax.Array:
    """Differentiable streamed SpMM: forward streams ``stream``, the VJP
    streams ``t_stream`` (= ``stream.transpose()``) for dx = A^T g — the
    same transpose-structure backward as the resident layouts (ops/spmm.py),
    with A never device-resident. Edge weights / norm are treated as
    constants (the static-weight convention of ``_spmm_ell``).

    Eager-only (the chunk loop is host-side Python): call OUTSIDE jit; the
    per-chunk steps are jitted internally. ``norm`` factors are per-node and
    symmetric per edge, so the same vector serves both directions."""

    @jax.custom_vjp
    def f(x):
        return streaming_spmm(stream, x, norm=norm, prefetch=prefetch)

    def fwd(x):
        return f(x), None

    def bwd(_, g):
        return (streaming_spmm(t_stream, g, norm=norm, prefetch=prefetch),)

    f.defvjp(fwd, bwd)
    return f(x)


class DistEdgeStream:
    """Multi-chip streamed aggregation with HOST-resident graph + features
    (BASELINE.json config #5, ogbn-papers100M).

    Composes :class:`EdgeStream` with the 1-D node partition of
    ``parallel/partition.py`` (owner(g) = g // n_max, n_max = ceil(N/P)
    rounded to the sublane multiple): chip p owns the contiguous dst range
    [p*n_max, (p+1)*n_max) and streams ONLY the in-edges of its owned
    nodes. Per chunk, the UNIQUE source rows each chip needs are gathered
    host-side from the (memmap-able) feature matrix and shipped with the
    chunk — so neither the edge structure nor x is ever device-resident,
    and there is NO collective: the halo is resolved through the stream,
    and P chips stream independently (P x aggregate host->device bandwidth
    on a real pod; serialized through the one tunnel here).

    All per-chip streams share one (chunk_edges, range_rows, num_chunks,
    u_max) geometry so ONE jitted shard_map step serves every chunk of
    every chip (chips with fewer edges consume all-padding chunks).
    """

    def __init__(
        self,
        edge_index,
        edge_weight=None,
        *,
        num_nodes: int,
        num_parts: int,
        chunk_edges: int = 1 << 20,
    ):
        ei = np.asarray(edge_index)
        src = np.asarray(ei[0], np.int64)
        dst = np.asarray(ei[1], np.int64)
        w = None if edge_weight is None else np.asarray(edge_weight, np.float32)
        P = int(num_parts)
        self.num_parts = P
        self.num_nodes = int(num_nodes)
        self.num_edges = int(src.shape[0])
        self.chunk_edges = int(chunk_edges)
        n_max = -(-num_nodes // P)
        self.n_max = ((n_max + 7) // 8) * 8

        # Per-chip dst-range streams (dst localized; src stays GLOBAL for
        # the host-side feature gather).
        streams = []
        for p in range(P):
            lo = p * self.n_max
            hi = min((p + 1) * self.n_max, num_nodes)
            m = (dst >= lo) & (dst < hi)
            streams.append(
                EdgeStream(
                    np.stack([src[m], dst[m] - lo]),
                    None if w is None else w[m],
                    num_nodes=self.n_max,
                    chunk_edges=self.chunk_edges,
                )
            )
        # Unify geometry: one compiled step for the whole mesh.
        R = max(s.range_rows for s in streams)
        self.streams = [
            EdgeStream(
                np.stack([s.src, s.dst]),
                s.weight,
                num_nodes=self.n_max,
                chunk_edges=self.chunk_edges,
                assume_sorted=True,
                min_range_rows=R,
            )
            for s in streams
        ]
        self.range_rows = R
        self.num_chunks = max(s.num_chunks for s in self.streams)
        self.has_weight = w is not None

        # Precompute per-(chip, chunk) unique-source tables: uniq (global
        # row ids to gather host-side) and inv (chunk-local slot -> unique
        # slot). Shipping unique rows de-duplicates hub features, which
        # power-law graphs repeat heavily within a chunk.
        self._uniq = [[] for _ in range(P)]
        self._inv = [[] for _ in range(P)]
        u_max = 8
        for p, s in enumerate(self.streams):
            for src_c, dstl, _, _ in s.chunks():
                valid = dstl < s.range_rows
                uniq, inv_valid = np.unique(src_c[valid], return_inverse=True)
                inv = np.zeros(self.chunk_edges, np.int32)
                inv[valid] = inv_valid.astype(np.int32)
                self._uniq[p].append(uniq.astype(np.int64))
                self._inv[p].append(inv)
                u_max = max(u_max, len(uniq))
        self.u_max = ((u_max + 7) // 8) * 8

    def spmm_host(
        self,
        x_host: np.ndarray,
        mesh,
        *,
        axis_name: str = "data",
        out_dtype=None,
        prefetch: int = 2,
    ) -> jax.Array:
        """out = A @ x over the mesh with A *and* x host-resident.

        ``x_host``: [num_nodes, F] numpy array or memmap — never transferred
        whole; each chunk ships only the u_max unique source rows it needs.
        Returns the [num_nodes, F] result (sharded [P*n_max, F] internally,
        padding rows cropped). Forward aggregation; at this scale training
        runs the host-feature sampled-minibatch path (train/host_loader.py).
        """
        from jax.sharding import NamedSharding, PartitionSpec as PS

        P_, R, C, U = self.num_parts, self.range_rows, self.chunk_edges, self.u_max
        F = int(x_host.shape[1])
        n_max, N = self.n_max, self.num_nodes
        out_dtype = out_dtype or x_host.dtype
        weighted = self.has_weight

        sharded = NamedSharding(mesh, PS(axis_name))
        sharded2 = NamedSharding(mesh, PS(axis_name, None))

        @jax.jit
        def step(out_sh, feats, inv, counts, w, d_lo):
            def local(out, feats, inv, counts, w, d_lo):
                out, feats, inv, counts, d_lo = (
                    out[0], feats[0], inv[0], counts[0], d_lo[0],
                )
                dstl = _rle_expand(counts, C)
                msg = jnp.take(feats, inv, axis=0)
                if weighted:
                    msg = msg * w[0][:, None].astype(msg.dtype)
                part = jax.ops.segment_sum(
                    msg, dstl, R + 1, indices_are_sorted=True
                )[:R].astype(out.dtype)
                cur = jax.lax.dynamic_slice(out, (d_lo[0], 0), (R, F))
                return jax.lax.dynamic_update_slice(out, cur + part, (d_lo[0], 0))[
                    None
                ]

            from jax.sharding import PartitionSpec as PSpec

            return jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(PSpec(axis_name, None),) * 2
                + (PSpec(axis_name),) * 3
                + (PSpec(axis_name),),
                out_specs=PSpec(axis_name, None),
                axis_names={axis_name},
            )(out_sh, feats, inv, counts, w, d_lo)

        # Per-chip [n_max + R] slab (dynamic-slice clamp guard), stacked.
        out_sh = jax.device_put(
            jnp.zeros((P_, n_max + R, F), out_dtype), sharded2
        )

        def host_batches():
            for c in range(self.num_chunks):
                feats = np.zeros((P_, U, F), x_host.dtype)
                inv = np.zeros((P_, C), np.int32)
                counts = np.zeros((P_, R + 1), np.int32)
                counts[:, R] = C  # default: all-padding chunk
                wts = np.zeros((P_, C), np.float32)
                d_lo = np.zeros((P_, 1), np.int32)
                for p, s in enumerate(self.streams):
                    if c >= s.num_chunks:
                        continue
                    lo, hi = c * C, min((c + 1) * C, s.num_edges)
                    n = hi - lo
                    u = self._uniq[p][c]
                    feats[p, : len(u)] = x_host[u]
                    inv[p] = self._inv[p][c]
                    cnt = np.bincount(
                        s.dst[lo:hi] - (int(s.dst[lo]) if n else 0),
                        minlength=R + 1,
                    ).astype(np.int32)
                    cnt[R] += C - n
                    counts[p] = cnt
                    if weighted and n:
                        wts[p, :n] = s.weight[lo:hi]
                    d_lo[p, 0] = int(s.dst[lo]) if n else 0
                yield (
                    jax.device_put(feats, sharded2),
                    jax.device_put(inv, sharded),
                    jax.device_put(counts, sharded),
                    jax.device_put(wts, sharded),
                    jax.device_put(d_lo, sharded),
                )

        for feats, inv, counts, w, d_lo in _prefetched(host_batches(), prefetch):
            out_sh = step(out_sh, feats, inv, counts, w, d_lo)
        return out_sh[:, :n_max].reshape(P_ * n_max, F)[:N]
