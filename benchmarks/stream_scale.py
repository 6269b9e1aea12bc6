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

from gnn_tpu.graphs.streaming import (
    EdgeStream,
    device_put_slabbed,
    streaming_spmm,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=100_000_000)
    ap.add_argument("--nodes", type=int, default=10_000_000)
    ap.add_argument("--feat", type=int, default=32)
    ap.add_argument("--chunk", type=int, default=1 << 22)  # 4.2M edges
    ap.add_argument("--grad", action="store_true", help="also stream dx = A^T g")
    ap.add_argument("--train-steps", type=int, default=0, help="host-feature sampled training steps to time")
    ap.add_argument("--batch", type=int, default=1024)
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

    # Slabbed forced device_put — large single transfers collapse to
    # ~5 MB/s through the proxied transport (see graphs/streaming.py).
    x_host = rng.normal(size=(N, F)).astype(np.float32)
    t0 = time.perf_counter()
    x = device_put_slabbed(x_host)
    print(json.dumps({"x_upload_s": round(time.perf_counter() - t0, 1)}), flush=True)

    def mem_mb():
        try:
            s = jax.local_devices()[0].memory_stats()
            return round(s.get("bytes_in_use", 0) / 1e6)
        except Exception:
            return -1

    m_before = mem_mb()
    t0 = time.perf_counter()
    out = streaming_spmm(stream, x)
    np.asarray(out[0, 0])  # honest force
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

    # --- streamed backward: dx = A^T g through the transpose stream --------
    if args.grad:
        from gnn_tpu.graphs.streaming import streaming_spmm_grad

        t0 = time.perf_counter()
        t_stream = stream.transpose()
        t_prep = time.perf_counter() - t0
        t0 = time.perf_counter()
        dx = jax.grad(
            lambda x: jnp.sum(jnp.abs(streaming_spmm_grad(stream, t_stream, x)))
        )(x)
        np.asarray(dx[0, 0])  # honest force
        dt_g = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "transpose_prep_s": round(t_prep, 1),
                    "stream_fwd_bwd_s": round(dt_g, 2),
                    "fwd_bwd_edges_per_s": round(2 * E / dt_g / 1e6, 1),
                    "unit": "M edges/s (2 passes)",
                    "grad_checksum": float(jnp.sum(dx[:1000])),
                }
            ),
            flush=True,
        )
        del t_stream, dx

    # --- host-feature sampled training at the same scale -------------------
    # (BASELINE.json config #5's TRAINING story: features never device-
    # resident whole; per-step transfer is the [batch_nodes, F] slab.)
    if args.train_steps:
        from gnn_tpu import nn, optim
        from gnn_tpu.models import GraphSAGE
        from gnn_tpu.train.host_loader import HostBatchLoader

        B, fanouts = args.batch, [10, 5]
        y = rng.integers(0, 8, N).astype(np.int32)
        t0 = time.perf_counter()
        loader = HostBatchLoader(
            np.stack([stream.src, stream.dst]),
            x_host,  # the host-resident features (memmap stand-in)
            y,
            fanouts,
            num_nodes=N,
        )
        prep = time.perf_counter() - t0
        model = GraphSAGE(F, 64, 8, key=jax.random.PRNGKey(0), dropout=0.0)
        params, static = nn.partition(model)
        opt = optim.adam(1e-3)
        ost = opt.init(params)
        adjs = loader.adjacencies(B)

        @jax.jit
        def host_step(params, ost, feats, ys):
            def loss_fn(p):
                logits = nn.combine(p, static).forward_sampled(feats, adjs)
                return nn.cross_entropy(logits, ys)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            upd, ost2 = opt.update(grads, ost, params)
            return optim.apply_updates(params, upd), ost2, loss

        m0 = mem_mb()
        seeds = rng.integers(0, N, B)
        feats, ys = loader.batch(seeds)
        params, ost, loss = host_step(
            params, ost, jax.device_put(feats), jax.device_put(ys)
        )  # compile
        float(loss)
        t0 = time.perf_counter()
        for _ in range(args.train_steps):
            seeds = rng.integers(0, N, B)
            feats, ys = loader.batch(seeds)
            params, ost, loss = host_step(
                params, ost, jax.device_put(feats), jax.device_put(ys)
            )
        float(loss)
        dt_t = (time.perf_counter() - t0) / args.train_steps
        edges_per_batch = B * fanouts[0] + B * (1 + fanouts[0]) * fanouts[1]
        print(
            json.dumps(
                {
                    "host_loader_prep_s": round(prep, 1),
                    "train_step_ms": round(dt_t * 1e3, 1),
                    "steps_per_s": round(1 / dt_t, 2),
                    "sampled_edges_per_s": round(
                        edges_per_batch / dt_t / 1e6, 2
                    ),
                    "unit": "M edges/s",
                    "batch": B,
                    "fanouts": fanouts,
                    "loss": round(float(loss), 4),
                    "hbm_mb_train": mem_mb(),
                    "hbm_mb_before_train": m0,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
