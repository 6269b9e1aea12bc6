"""Clustered-graph SpMM: blocked (MXU) layout vs sorted-ELL vs gather SOL.

The headline bench (bench.py) uses a locality-FREE power-law graph, where
the gather-rate roofline is the physical wall (reached at ~0.98 in round
2). Real graphs are not locality-free: citation/social graphs have strong
community structure, and the cluster-packed block-diagonal layout
(graphs/blocked.py) aggregates intra-community edges as batched MXU
matmuls — no gather at all. This benchmark quantifies that on an
arxiv-scale synthetic with realistic community structure, with node ids
SHUFFLED so the layout must *discover* the structure (label propagation),
exactly as it would on real data.

Honest-measurement rules of docs/PERF.md apply: one jitted fori_loop with
normalized feedback (kills loop-invariant hoisting), nonlinear consumption,
calibrated normalization overhead subtracted, min-of-reps. The gather SOL
is calibrated on-chip in the same run — ``vs_gather_sol > 1`` means the
layout beats what ANY gather-based SpMM could do on this chip.

Usage: python benchmarks/blocked.py [--nodes N] [--edges E] [--feat F]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")  # run from the repo root


def _chain(body, iters):
    # The operand (e.g. an Adjacency with a few-hundred-MB blocked layout)
    # is a jit ARGUMENT, not a closure constant: closure constants embed in
    # the lowered module and overflow the remote-compile transport.
    @jax.jit
    def loop(x, operand):
        return jax.lax.fori_loop(0, iters, lambda i, x: body(x, operand), x)

    return loop


def _time(loop, x, iters, operand=None, reps=3):
    out = loop(x, operand)
    np.asarray(out[0, 0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = loop(x, operand)
        np.asarray(out[0, 0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def _normalize(v):
    return v * (1.0 / jnp.max(jnp.abs(v)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=169_343)
    ap.add_argument("--edges", type=int, default=1_157_799)
    ap.add_argument("--feat", type=int, default=128)
    ap.add_argument("--intra", type=float, default=0.85)
    ap.add_argument("--community", type=int, default=200)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from gnn_tpu import graphs
    from gnn_tpu.graphs.generate import clustered_power_law
    from gnn_tpu.ops import spmm

    t0 = time.perf_counter()
    ei = clustered_power_law(
        args.nodes,
        args.edges,
        avg_community=args.community,
        intra_frac=args.intra,
        seed=0,
    )
    ei, _ = graphs.to_undirected(ei, num_nodes=args.nodes)
    ei, w = graphs.gcn_norm(ei, num_nodes=args.nodes, self_loops=True)
    E = ei.shape[1]
    print(
        json.dumps(
            {
                "workload": "clustered_power_law (ids shuffled)",
                "nodes": args.nodes,
                "edges": int(E),
                "feat": args.feat,
                "intra_frac": args.intra,
                "gen_s": round(time.perf_counter() - t0, 1),
            }
        ),
        flush=True,
    )

    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(args.nodes, args.feat)).astype(
            np.float32
        )
    )
    iters = args.iters

    # calibrations (same expressions as bench.py)
    dt_nrm = _time(
        _chain(lambda x, _: _normalize(x + 1.0), iters), x, iters
    )
    cal_idx = jnp.asarray(
        np.random.default_rng(2).integers(0, args.nodes, E).astype(np.int32)
    )

    def gather_body(x, idx):
        g = jnp.take(x, idx, axis=0)
        return _normalize(x + jnp.sum(g * g, axis=0)[None, :] * 1e-6)

    dt_gather = (
        _time(_chain(gather_body, iters), x, iters, operand=cal_idx) - dt_nrm
    )
    ns_per_row = dt_gather / E * 1e9
    sol = 2 * E * ns_per_row * 1e-9
    print(
        json.dumps({"gather_ns_per_row": round(ns_per_row, 3)}), flush=True
    )

    results = {}
    for name, kwargs in (
        ("sorted_ell", dict(reorder=True, hub_dense=400)),
        ("blocked_r256", dict(reorder="cluster", block_rows=256)),
        ("blocked_r512", dict(reorder="cluster", block_rows=512)),
        (
            "blocked_r512_bf16",
            dict(
                reorder="cluster",
                block_rows=512,
                block_dtype=jnp.bfloat16,
            ),
        ),
    ):
        t0 = time.perf_counter()
        adj = graphs.build_adjacency(
            ei, jnp.asarray(w), num_nodes=args.nodes, **kwargs
        )
        prep_s = time.perf_counter() - t0
        extra = {}
        if adj.blocked is not None:
            lay = adj.blocked
            cap = lay.num_dense_edges / (
                lay.num_dense_edges + lay.num_rem_edges
            )
            extra = {
                "dense_capture": round(cap, 3),
                "blocks": lay.num_blocks,
                "block_MB": round(
                    lay.diag.size * lay.diag.dtype.itemsize / 1e6, 1
                ),
            }

        def step(x, adj):
            dx = jax.grad(lambda x: 0.5 * jnp.sum(spmm(adj, x) ** 2))(x)
            return _normalize(dx)

        dt = _time(_chain(step, iters), x, iters, operand=adj) - dt_nrm
        results[name] = dt
        print(
            json.dumps(
                {
                    "layout": name,
                    "step_ms": round(dt * 1e3, 3),
                    "edges_per_s": round(E / dt / 1e6, 1),
                    "unit": "M edges/s",
                    "vs_gather_sol": round(sol / dt, 3),
                    "prep_s": round(prep_s, 1),
                    **extra,
                }
            ),
            flush=True,
        )

    best = min(
        (v for k, v in results.items() if k.startswith("blocked")),
        default=None,
    )
    if best is not None and "sorted_ell" in results:
        print(
            json.dumps(
                {
                    "speedup_best_blocked_vs_sorted": round(
                        results["sorted_ell"] / best, 2
                    )
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
