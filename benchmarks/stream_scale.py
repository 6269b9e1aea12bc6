"""papers100M-scale dryrun: stream 100M synthetic edges through one chip.

Proves (a) the graph never sits in HBM — device memory stays bounded by
x + out + one chunk buffer regardless of E — and (b) records streamed
aggregation throughput. Run on the real TPU:

    python benchmarks/stream_scale.py [--edges 100000000] [--nodes 10000000]

The synthetic graph is power-law-ish via preferential-style sampling on the
host, generated in slabs to bound host RAM too.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")  # run from the repo root

import jax
import jax.numpy as jnp
import numpy as np

from gnn_tpu.graphs.streaming import EdgeStream, streaming_spmm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=100_000_000)
    ap.add_argument("--nodes", type=int, default=10_000_000)
    ap.add_argument("--feat", type=int, default=32)
    ap.add_argument("--chunk", type=int, default=1 << 22)  # 4.2M edges
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    E, N, F = args.edges, args.nodes, args.feat
    print(json.dumps({"nodes": N, "edges": E, "feat": F, "chunk": args.chunk}), flush=True)

    t0 = time.perf_counter()
    # Skewed sources (power-law-ish), uniform destinations; generated in one
    # go (100M int32 pairs = 800 MB host RAM).
    src = (N * rng.random(E) ** 3).astype(np.int32)
    dst = rng.integers(0, N, E).astype(np.int32)
    print(json.dumps({"gen_s": round(time.perf_counter() - t0, 1)}), flush=True)

    t0 = time.perf_counter()
    stream = EdgeStream(
        np.stack([src, dst]), num_nodes=N, chunk_edges=args.chunk
    )
    del src, dst
    print(
        json.dumps(
            {
                "prep_s": round(time.perf_counter() - t0, 1),
                "chunks": stream.num_chunks,
                "range_rows": stream.range_rows,
            }
        ),
        flush=True,
    )

    x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))

    def mem_mb():
        try:
            s = jax.local_devices()[0].memory_stats()
            return round(s.get("bytes_in_use", 0) / 1e6)
        except Exception:
            return -1

    m_before = mem_mb()
    t0 = time.perf_counter()
    out = streaming_spmm(stream, x)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    m_after = mem_mb()
    expected_mb = (2 * N * F * 4 + 3 * args.chunk * 4) / 1e6
    print(
        json.dumps(
            {
                "stream_spmm_s": round(dt, 2),
                "edges_per_s": round(E / dt / 1e6, 1),
                "unit": "M edges/s",
                "hbm_mb_before": m_before,
                "hbm_mb_after": m_after,
                "hbm_mb_expected_bound": round(expected_mb + 200),
                "bounded": bool(
                    m_after < 0 or m_after - m_before < expected_mb + 500
                ),
            }
        ),
        flush=True,
    )
    # checksum so nothing is DCE'd and reruns can diff
    print(json.dumps({"checksum": float(jnp.sum(out[:1000]))}), flush=True)


if __name__ == "__main__":
    main()
