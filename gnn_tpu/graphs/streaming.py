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
    "device_put_slabbed",
]


def device_put_slabbed(arr, *, slab_bytes: int = 128 << 20) -> jax.Array:
    """Upload a large host array in row-major slabs, forcing each.

    The proxied device transport's throughput collapses for very large
    single transfers (measured on this tunnel: 256 MB at ~29 MB/s but
    1.28 GB at ~5 MB/s, and unforced queues degrade further) — slab-wise
    forced puts keep the full ~29 MB/s. Slabs are concatenated on device
    (briefly 2x memory). On directly-attached hardware this is equivalent
    to one device_put."""
    arr = np.asarray(arr)
    if arr.nbytes <= slab_bytes or arr.ndim == 0:
        d = jax.device_put(arr)
        np.asarray(d.ravel()[0] if arr.size else d)
        return d
    rows_per = max(1, int(slab_bytes // max(arr[:1].nbytes, 1)))
    slabs = []
    for lo in range(0, arr.shape[0], rows_per):
        d = jax.device_put(arr[lo : lo + rows_per])
        np.asarray(d.ravel()[0])  # force: unforced queues degrade
        slabs.append(d)
    return jnp.concatenate(slabs, axis=0)

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
        # Static geometry for the scatter-free rank-compact segment sum
        # (device path of streaming_spmm; disabled for chunk sizes the
        # fixed sub-chunk doesn't tile).
        if self.chunk_edges % RANK_CK == 0 and self.num_edges:
            self.rank_h, self.rank_k = _rank_geometry(
                self.dst, self.chunk_edges
            )
        else:
            self.rank_h = self.rank_k = 0

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
        :func:`_rle_expand`."""
        R = self.range_rows
        for src, dstl, w, d_lo in self.chunks():
            counts = np.bincount(dstl, minlength=R + 1).astype(np.int32)
            yield src, counts, w, d_lo

    def chunks_packed(self) -> Iterator[Tuple[np.ndarray, int]]:
        """One contiguous int32 buffer per chunk:
        [src (C) | counts (R+1) | weight bitcast (C, only if weighted)].
        A single host->device transfer per chunk — the proxied transport
        pays a large fixed latency per transfer, so fewer, larger puts win
        (see streaming_spmm's schedule)."""
        for src, counts, w, d_lo in self.chunks_rle():
            parts = [src, counts]
            if w is not None:
                parts.append(w.view(np.int32))
            yield np.concatenate(parts), d_lo


RANK_CK = 512  # fixed sub-chunk of the rank-compact segment sum


def _rank_geometry(dst_sorted: np.ndarray, chunk_edges: int):
    """Host scan for the rank-compact segment sum's static geometry: over
    all chunks, the max distinct-destination count per RANK_CK-edge window
    (H — the one-hot height) and per chunk (K — the compact output rows,
    +1 rank reserved for padding slots). O(E), structure-only."""
    E = len(dst_sorted)
    C = int(chunk_edges)
    H = K = 1
    for lo in range(0, max(E, 1), C):
        d = dst_sorted[lo : lo + C]
        if len(d) == 0:
            continue
        rank = np.empty(len(d), np.int64)
        rank[0] = 0
        np.cumsum(np.diff(d) != 0, out=rank[1:])
        K = max(K, int(rank[-1]) + 2)  # +1 rank for padding slots
        idx = np.arange(0, len(d), RANK_CK)
        ends = np.minimum(idx + RANK_CK, len(d)) - 1
        # +1 slack: a short chunk's padding run adds one distinct rank to
        # whatever window it starts in
        H = max(H, int((rank[ends] - rank[idx]).max()) + 2)
    return ((H + 7) // 8) * 8, ((K + 7) // 8) * 8


def _rank_segment_sum(msg, counts, *, C, R, H, K):
    """Sorted segment-sum WITHOUT a scatter: the compact-rank one-hot MXU
    reduction (A/B'd on chip in benchmarks/stream_step.py — the XLA sorted
    scatter ran 78 ms per 1M-edge chunk at F=32; this runs ~10 ms).

    Ranks (gapless indices of distinct destinations) make the one-hot
    height H a *distinct-count* bound instead of a row-span bound, so the
    batched [G, H, Ck] x [G, Ck, F] matmul stays skinny; partials combine
    by monotone dynamic-slice adds in compact rank space, and one [R]-row
    gather maps ranks back to destination rows. msg f32 uses the bf16
    hi+lo two-pass split (f32-grade error, see ops/pallas/segment.py).
    Returns [R, F] partial sums (padding slots dropped)."""
    F = msg.shape[1]
    nz = (counts > 0).astype(jnp.int32)
    rank_of = jnp.cumsum(nz) - nz  # [R+1] exclusive nonzero prefix
    starts = jnp.cumsum(counts)[:-1]  # [R] starts of segments 1..R
    marks = jnp.zeros((C,), jnp.int32).at[starts].add(1)
    marks = jnp.minimum(marks, 1).at[0].set(0)
    edge_rank = jnp.cumsum(marks)  # [C] compact rank per edge slot
    G = C // RANK_CK
    er = edge_rank.reshape(G, RANK_CK)
    base = er[:, 0]
    local = er - base[:, None]  # [G, Ck] in [0, H)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, H, 1), 1)
    dn = (((2,), (1,)), ((0,), (0,)))
    m3 = msg.reshape(G, RANK_CK, F)
    # precision note (measured on chip, round 5): DEFAULT lowers f32 dots
    # to ONE bf16 pass (2e-2 abs error on N(0,1) sums), and the manual
    # bf16 hi+lo two-pass trick is silently ALGEBRAICALLY FOLDED by XLA
    # into dot(onehot, hi+lo) == the same single pass (the Pallas kernel
    # is immune only because Mosaic compiles its dots directly). HIGHEST
    # measured the SAME wall time as the folded single pass here — the
    # one-hot matmul is bandwidth-, not MXU-bound — at 6e-7 error.
    onehot = (local[:, None, :] == iota).astype(msg.dtype)
    partial = jax.lax.dot_general(
        onehot, m3, dimension_numbers=dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    def body(g, oc):
        cur = jax.lax.dynamic_slice(oc, (base[g], 0), (H, F))
        return jax.lax.dynamic_update_slice(oc, cur + partial[g], (base[g], 0))

    # The init must inherit the data's varying-manual-axes under shard_map
    # (a replicated zeros carry fails the fori type check on a mesh);
    # zeros_like propagates vma from `partial`.
    oc0 = jnp.zeros((K + H, F), jnp.float32) + jnp.zeros_like(
        partial, shape=(1, 1)
    )
    oc = jax.lax.fori_loop(0, G, body, oc0)
    return jnp.take(oc, rank_of[:R], axis=0) * nz[:R, None].astype(jnp.float32)


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


def _overlapped(host_batches, put, force):
    """The measured-fastest schedule on the proxied device transport:
    issue the NEXT chunk's device_put, then FORCE the current chunk's
    transfer (cheap scalar readback) before dispatching its compute.

    Why forcing helps (counter-intuitive, measured): left unforced, the
    relay's async queue serializes the chained puts/executions with a
    multi-second penalty per chunk (~0.3 M edges/s); the forced schedule
    with one upload in flight runs at the wire bandwidth (~20-25 MB/s on
    this tunnel, 15x faster end-to-end). On directly-attached hardware the
    force is a no-op-cost sync and the one-ahead put still overlaps upload
    with compute."""
    batches = iter(host_batches)
    try:
        cur = put(next(batches))
    except StopIteration:
        return
    for nxt in batches:
        nxt_dev = put(nxt)
        force(cur)
        yield cur
        cur = nxt_dev
    force(cur)
    yield cur


def streaming_spmm(
    stream: EdgeStream,
    x: jax.Array,
    *,
    out_dtype=None,
    norm: Optional[jax.Array] = None,
    segment_backend: str = "auto",
) -> jax.Array:
    """out = A @ x with A streamed from the host chunk by chunk.

    Device memory: x + out + two in-flight [chunk] packed buffers + the
    [chunk_edges, F] gather buffer — independent of total edge count.
    Each chunk ships as ONE packed int32 transfer (src | RLE counts |
    bitcast weights) on the :func:`_overlapped` schedule — the transport's
    per-transfer latency dominates, so one put per chunk with the next
    upload in flight is the measured optimum.

    ``norm``: optional device-resident [num_nodes] f32 vector of per-node
    factors; per-edge weight w_e = norm[src_e] * norm[dst_e] is recomputed
    ON DEVICE (e.g. the d^-1/2 factors of gcn_norm), eliminating the
    [chunk_edges] f32 weight section of the packed transfer — the stream is
    host-bandwidth-bound, so fewer bytes is directly more edges/s.
    Mutually exclusive with baked per-edge weights.

    Differentiation: this function is a host-side loop (not jittable);
    for a grad-capable streamed SpMM use :func:`streaming_spmm_grad`.
    """
    if norm is not None and stream.weight is not None:
        raise ValueError("pass either baked edge weights or norm, not both")
    if segment_backend not in ("auto", "rank", "scatter"):
        raise ValueError(f"unknown segment_backend '{segment_backend}'")
    F = x.shape[1]
    R = stream.range_rows
    C = stream.chunk_edges
    N = stream.num_nodes
    out_dtype = out_dtype or x.dtype
    weighted = stream.weight is not None
    use_norm = norm is not None
    use_rank = segment_backend != "scatter" and stream.rank_h > 0
    if segment_backend == "rank" and not use_rank:
        raise ValueError(
            f"rank backend needs chunk_edges % {RANK_CK} == 0"
        )

    @jax.jit
    def step(out, x, norm, packed, d_lo):
        src = packed[:C]
        counts = packed[C : C + R + 1]
        msg = jnp.take(x, src, axis=0)
        if use_norm:
            # Re-expand the run-length counts into the sorted local dst
            # ids (only this branch needs them per-edge).
            dstl = _rle_expand(counts, C)
            dst_g = jnp.minimum(d_lo + dstl, N - 1)
            we = jnp.take(norm, src) * jnp.take(norm, dst_g)
            msg = msg * we[:, None].astype(msg.dtype)
        elif weighted:
            w = jax.lax.bitcast_convert_type(
                packed[C + R + 1 :], jnp.float32
            )
            msg = msg * w[:, None].astype(msg.dtype)
        if use_rank:
            # scatter-free compact-rank reduction: measured 2.1x the whole
            # step over the XLA scatter on chip (benchmarks/stream_step.py)
            part = _rank_segment_sum(
                msg, counts, C=C, R=R, H=stream.rank_h, K=stream.rank_k
            ).astype(out.dtype)
        else:
            dstl = _rle_expand(counts, C)
            part = jax.ops.segment_sum(
                msg, dstl, R + 1, indices_are_sorted=True
            )[:R].astype(out.dtype)
        cur = jax.lax.dynamic_slice(out, (d_lo, 0), (R, F))
        return jax.lax.dynamic_update_slice(out, cur + part, (d_lo, 0))

    # Rows within R of the end would make the dynamic slice clamp and
    # misalign the range; guard by padding out once, slicing back after.
    out = jnp.zeros((N + R, F), out_dtype)
    for packed, d_lo in _overlapped(
        stream.chunks_packed(),
        put=lambda b: (jax.device_put(b[0]), b[1]),
        force=lambda d: np.asarray(d[0][0]),
    ):
        out = step(out, x, norm, packed, d_lo)
    return out[:N]


def streaming_spmm_grad(
    stream: EdgeStream,
    t_stream: EdgeStream,
    x: jax.Array,
    *,
    norm: Optional[jax.Array] = None,
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
        return streaming_spmm(stream, x, norm=norm)

    def fwd(x):
        return f(x), None

    def bwd(_, g):
        return (streaming_spmm(t_stream, g, norm=norm),)

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
        # shared rank-compact geometry (one compiled step for the mesh)
        self.rank_h = max(s.rank_h for s in self.streams)
        self.rank_k = max(s.rank_k for s in self.streams)
        if any(s.rank_h == 0 for s in self.streams):
            self.rank_h = self.rank_k = 0

        # First pass: only the per-chunk unique-source COUNTS (u_max sizes
        # the packed transfer; ``u_sizes`` lets callers audit the padding
        # waste). The uniq/inv tables themselves (~8 bytes/edge — several
        # GB at papers100M scale) are NOT stored: host_batches recomputes
        # them lazily one chunk ahead of the transfer they feed, so host
        # RAM stays O(chunk), not O(E).
        self.u_sizes = [
            [len(self._chunk_uniq(p, c)[0]) for c in range(s.num_chunks)]
            for p, s in enumerate(self.streams)
        ]
        u_max = max(8, max((u for row in self.u_sizes for u in row), default=8))
        self.u_max = ((u_max + 7) // 8) * 8

    def _chunk_uniq(self, p: int, c: int):
        """(uniq global src ids, chunk-local slot -> unique slot) for chip
        p's chunk c — recomputed on demand (see __init__)."""
        s = self.streams[p]
        C = self.chunk_edges
        lo, hi = c * C, min((c + 1) * C, s.num_edges)
        uniq, inv_valid = np.unique(s.src[lo:hi], return_inverse=True)
        inv = np.zeros(C, np.int32)
        inv[: hi - lo] = inv_valid.astype(np.int32)
        return uniq.astype(np.int64), inv

    def spmm_host(
        self,
        x_host: np.ndarray,
        mesh,
        *,
        axis_name: str = "data",
        out_dtype=None,
    ) -> jax.Array:
        """out = A @ x over the mesh with A *and* x host-resident.

        ``x_host``: [num_nodes, F] numpy array or memmap — never transferred
        whole; each chunk ships only the u_max unique source rows it needs.
        Returns the [num_nodes, F] result (sharded [P*n_max, F] internally,
        padding rows cropped). Forward aggregation; at this scale training
        runs the host-feature sampled-minibatch path (train/host_loader.py).

        All per-chip sections of a chunk — inv, counts, d_lo, weights,
        unique features (f32 sections bitcast to i32) — pack into ONE
        [P, L] transfer per chunk, shipped on the :func:`_overlapped`
        schedule (see streaming_spmm: the transport's per-transfer latency
        dominates).

        Padding note: every chunk's feature section is padded to the GLOBAL
        worst-case ``u_max`` unique-source count (one compiled step serves
        all chunks), so one hub-heavy chunk inflates every chunk's transfer
        on this host-bandwidth-bound path. Audit the waste with
        ``1 - mean(u)/u_max`` over ``self.u_sizes``; smaller ``chunk_edges``
        tightens the spread (more per-transfer latency), larger amortizes
        latency but widens it.
        """
        from jax.sharding import NamedSharding, PartitionSpec as PS

        P_, R, C, U = self.num_parts, self.range_rows, self.chunk_edges, self.u_max
        F = int(x_host.shape[1])
        n_max, N = self.n_max, self.num_nodes
        out_dtype = out_dtype or x_host.dtype
        weighted = self.has_weight
        # Packed section offsets: [inv C | counts R+1 | d_lo 1 | w C? | feats U*F]
        o_cnt = C
        o_dlo = o_cnt + R + 1
        o_w = o_dlo + 1
        o_feat = o_w + (C if weighted else 0)
        L = o_feat + U * F

        sharded = NamedSharding(mesh, PS(axis_name))
        sharded2 = NamedSharding(mesh, PS(axis_name, None))

        @jax.jit
        def step(out_sh, packed):
            def local(out, packed):
                out, packed = out[0], packed[0]
                inv = packed[:o_cnt]
                counts = packed[o_cnt:o_dlo]
                d_lo = packed[o_dlo]
                feats = jax.lax.bitcast_convert_type(
                    packed[o_feat:], jnp.float32
                ).reshape(U, F)
                msg = jnp.take(feats, inv, axis=0)
                if weighted:
                    w = jax.lax.bitcast_convert_type(
                        packed[o_w : o_w + C], jnp.float32
                    )
                    msg = msg * w[:, None].astype(msg.dtype)
                if self.rank_h > 0:
                    part = _rank_segment_sum(
                        msg, counts, C=C, R=R, H=self.rank_h, K=self.rank_k
                    ).astype(out.dtype)
                else:
                    dstl = _rle_expand(counts, C)
                    part = jax.ops.segment_sum(
                        msg, dstl, R + 1, indices_are_sorted=True
                    )[:R].astype(out.dtype)
                cur = jax.lax.dynamic_slice(out, (d_lo, 0), (R, F))
                return jax.lax.dynamic_update_slice(
                    out, cur + part, (d_lo, 0)
                )[None]

            return jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(PS(axis_name, None), PS(axis_name)),
                out_specs=PS(axis_name, None),
                axis_names={axis_name},
            )(out_sh, packed)

        # Per-chip [n_max + R] slab (dynamic-slice clamp guard), stacked.
        out_sh = jax.device_put(
            jnp.zeros((P_, n_max + R, F), out_dtype), sharded2
        )

        def host_batches():
            for c in range(self.num_chunks):
                packed = np.zeros((P_, L), np.int32)
                for p, s in enumerate(self.streams):
                    row = packed[p]
                    if c >= s.num_chunks:
                        row[o_cnt + R] = C  # all-padding chunk
                        continue
                    lo, hi = c * C, min((c + 1) * C, s.num_edges)
                    n = hi - lo
                    u, inv = self._chunk_uniq(p, c)
                    row[:o_cnt] = inv
                    cnt = np.bincount(
                        s.dst[lo:hi] - (int(s.dst[lo]) if n else 0),
                        minlength=R + 1,
                    ).astype(np.int32)
                    cnt[R] += C - n
                    row[o_cnt:o_dlo] = cnt
                    row[o_dlo] = int(s.dst[lo]) if n else 0
                    if weighted and n:
                        w = np.zeros(C, np.float32)
                        w[:n] = s.weight[lo:hi]
                        row[o_w : o_w + C] = w.view(np.int32)
                    feats = np.zeros((U, F), np.float32)
                    feats[: len(u)] = x_host[u]
                    row[o_feat:] = feats.reshape(-1).view(np.int32)
                yield packed

        for packed in _overlapped(
            host_batches(),
            put=lambda b: jax.device_put(b, sharded),
            force=lambda d: np.asarray(d[0, 0]),
        ):
            out_sh = step(out_sh, packed)
        return out_sh[:, :n_max].reshape(P_ * n_max, F)[:N]
