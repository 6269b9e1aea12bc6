"""Device-resident streaming-chunk-step decomposition + fused prototypes.

The 100M-edge stream is transport-bound on this tunnel, but on real
PCIe/pod hosts the per-chunk DEVICE step (gather + RLE re-expansion +
sorted segment-sum + slice-add) becomes the bound — measured 17 M edges/s
at F=32 / chunk 1M in round 4 (docs/PERF.md). This benchmark splits that
step into its pieces on-chip and A/Bs fused alternatives (VERDICT r4 #4):

* ``expand``   — the _rle_expand scatter+cumsum alone
* ``gather``   — x[src] alone (nonlinear consume)
* ``step``     — the shipped streaming_spmm step
* ``rank``     — prototype: compact-rank one-hot MXU reduction (segment
  sum as G batched [H, Ck] x [Ck, F] matmuls in gapless rank space, then
  one [R]-row gather back to segment rows) — no scatter anywhere.

Run on the real TPU: python benchmarks/stream_step.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from gnn_tpu.graphs.streaming import EdgeStream, _rle_expand


def force(a):
    np.asarray(a.ravel()[0])


def timeit(fn, *args, reps=3):
    out = fn(*args)
    force(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        force(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=5_000_000)
    ap.add_argument("--nodes", type=int, default=2_000_000)
    ap.add_argument("--feat", type=int, default=32)
    ap.add_argument("--chunk", type=int, default=1 << 20)
    ap.add_argument("--ck", type=int, default=512, help="rank-kernel chunk")
    args = ap.parse_args()
    E, N, F, C, Ck = args.edges, args.nodes, args.feat, args.chunk, args.ck

    rng = np.random.default_rng(0)
    src = (N * rng.random(E) ** 3).astype(np.int32)
    dst = rng.integers(0, N, E).astype(np.int32)
    stream = EdgeStream(np.stack([src, dst]), num_nodes=N, chunk_edges=C)
    R = stream.range_rows
    G = C // Ck
    assert C % Ck == 0

    # Host-side static geometry for the rank prototype: max distinct dst in
    # any Ck-window (H) and per-chunk distinct count (K) across all chunks.
    H = 0
    K = 0
    for c in range(stream.num_chunks):
        lo, hi = c * C, min((c + 1) * C, E)
        d = stream.dst[lo:hi]
        marks = np.empty(len(d), np.int64)
        marks[0] = 0
        marks[1:] = (np.diff(d) != 0).astype(np.int64)
        ranks = np.cumsum(marks)
        K = max(K, int(ranks[-1]) + 1 + 1)  # +1 rank for the padding slot
        for g in range(0, len(d), Ck):
            span = int(ranks[min(g + Ck, len(d)) - 1] - ranks[g]) + 1
            H = max(H, span)
    H = ((H + 7) // 8) * 8
    K = ((K + 7) // 8) * 8
    print(json.dumps({"E": E, "N": N, "F": F, "C": C, "Ck": Ck, "R": R,
                      "H": H, "K": K, "chunks": stream.num_chunks}), flush=True)

    # Device-resident packed chunk buffers (the transport is NOT measured).
    packs = []
    for packed, d_lo in stream.chunks_packed():
        d = jax.device_put(packed)
        force(d)
        packs.append((d, d_lo))
    x = jax.device_put(rng.normal(size=(N, F)).astype(np.float32))
    force(x)

    # --- shipped step (streaming_spmm internals, chained over chunks) ----
    @jax.jit
    def step(out, x, packed, d_lo):
        src = packed[:C]
        counts = packed[C : C + R + 1]
        dstl = _rle_expand(counts, C)
        msg = jnp.take(x, src, axis=0)
        part = jax.ops.segment_sum(
            msg, dstl, R + 1, indices_are_sorted=True
        )[:R].astype(out.dtype)
        cur = jax.lax.dynamic_slice(out, (d_lo, 0), (R, F))
        return jax.lax.dynamic_update_slice(out, cur + part, (d_lo, 0))

    def run_step(fn):
        out = jnp.zeros((N + R, F), jnp.float32)
        for d, d_lo in packs:
            out = fn(out, x, d, d_lo)
        return out

    # --- pieces ----------------------------------------------------------
    @jax.jit
    def expand_only(out, x, packed, d_lo):
        counts = packed[C : C + R + 1]
        dstl = _rle_expand(counts, C)
        v = jnp.sum(dstl * dstl)  # nonlinear consume
        return out.at[0, 0].add(v.astype(out.dtype) * 1e-20)

    @jax.jit
    def gather_only(out, x, packed, d_lo):
        src = packed[:C]
        msg = jnp.take(x, src, axis=0)
        v = jnp.sum(msg * msg, axis=0)  # nonlinear consume
        return out.at[0].add(v * 1e-20)

    @jax.jit
    def gather_expand(out, x, packed, d_lo):
        src = packed[:C]
        counts = packed[C : C + R + 1]
        dstl = _rle_expand(counts, C)
        msg = jnp.take(x, src, axis=0)
        v = jnp.sum(msg * msg, axis=0) + jnp.sum(dstl * dstl) * 1e-9
        return out.at[0].add(v * 1e-20)

    # --- rank-compact one-hot MXU path (the SHIPPED fast backend) --------
    from gnn_tpu.graphs.streaming import _rank_segment_sum

    Hs, Ks = stream.rank_h, stream.rank_k

    @jax.jit
    def step_rank(out, x, packed, d_lo):
        src = packed[:C]
        counts = packed[C : C + R + 1]
        msg = jnp.take(x, src, axis=0)
        part = _rank_segment_sum(msg, counts, C=C, R=R, H=Hs, K=Ks)
        cur = jax.lax.dynamic_slice(out, (d_lo, 0), (R, F))
        return jax.lax.dynamic_update_slice(out, cur + part.astype(out.dtype), (d_lo, 0))

    # correctness of the prototype vs the shipped step
    o1 = run_step(step)
    o2 = run_step(step_rank)
    err = float(jnp.max(jnp.abs(o1 - o2)) / (jnp.max(jnp.abs(o1)) + 1e-9))
    print(json.dumps({"rank_rel_err": err}), flush=True)

    for name, fn in (
        ("expand", expand_only),
        ("gather", gather_only),
        ("gather+expand", gather_expand),
        ("step", step),
        ("rank", step_rank),
    ):
        dt = timeit(run_step, fn)
        print(
            json.dumps(
                {
                    "variant": name,
                    "total_ms": round(dt * 1e3, 1),
                    "medges_per_s": round(E / dt / 1e6, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
