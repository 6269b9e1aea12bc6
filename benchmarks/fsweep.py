"""Feature-width sweep: SpMM fwd+bwd step at F = 128 / 256 / 512 for the
sorted-ELL and cluster-blocked layouts (VERDICT r4 #8).

Why: the gather wall is a PER-ROW issue-rate limit, so wider feature rows
amortize it (round-2 note), and the blocked layout's MXU side is at its
skinny-N shape roof at F=128 — wider F should proportionally improve it
(docs/PERF.md round-4 probes). This records the measured curve.

Methodology = bench.py exactly: chained fori_loop with gradient feedback
(defeats loop-invariant hoisting), in-run gather-rate calibration PER
WIDTH (the rate is row-size-dependent), min-of-reps, honest forcing.

Run on TPU:  python benchmarks/fsweep.py [--quick]
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

N = 169_343
E_DIRECTED = 1_157_799


def force(a):
    np.asarray(a.ravel()[0])


def chain(body, iters):
    @jax.jit
    def loop(x, operand):
        return jax.lax.fori_loop(0, iters, lambda i, x: body(x, operand), x)

    return loop


def timeit(loop, x, operand, iters, reps=3):
    out = loop(x, operand)
    force(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = loop(x, operand)
        force(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def nrm(v):
    return v * (1.0 / jnp.max(jnp.abs(v)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--widths", type=int, nargs="+", default=[128, 256, 512])
    args = ap.parse_args()
    iters = 5 if args.quick else 10
    reps = 2 if args.quick else 3

    from gnn_tpu import graphs
    from gnn_tpu.graphs.generate import clustered_power_law, power_law
    from gnn_tpu.ops import spmm

    rng = np.random.default_rng(1)

    # sorted-ELL on the locality-free power-law graph (bench.py primary)
    ei = power_law(N, E_DIRECTED, alpha=0.8, seed=0)
    ei, _ = graphs.to_undirected(ei, num_nodes=N)
    ei, w = graphs.gcn_norm(ei, num_nodes=N, self_loops=True)
    adj_s = graphs.build_adjacency(
        ei, jnp.asarray(w), num_nodes=N, reorder=True, hub_dense=400
    )
    e_s = adj_s.num_edges

    # blocked on the clustered graph (bench.py secondary)
    ei_b = clustered_power_law(
        N, E_DIRECTED, avg_community=200, intra_frac=0.85, seed=0
    )
    ei_b, _ = graphs.to_undirected(ei_b, num_nodes=N)
    ei_b, w_b = graphs.gcn_norm(ei_b, num_nodes=N, self_loops=True)
    adj_b = graphs.build_adjacency(
        ei_b, jnp.asarray(w_b), num_nodes=N,
        reorder="cluster", block_rows=512, block_dtype=jnp.bfloat16,
    )
    e_b = adj_b.num_edges

    def step(x, adj_op):
        dx = jax.grad(lambda x: 0.5 * jnp.sum(spmm(adj_op, x) ** 2))(x)
        return nrm(dx)

    for F in args.widths:
        x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
        dt_nrm = timeit(
            chain(lambda x, _: nrm(x + 1.0), iters), x, 0, iters, reps
        )
        # per-width gather calibration (nonlinear consume; see bench.py)
        cal_idx = jnp.asarray(
            rng.integers(0, N, e_s).astype(np.int32)
        )

        def gather_body(x, idx):
            g = jnp.take(x, idx, axis=0)
            return nrm(x + jnp.sum(g * g, axis=0)[None, :] * 1e-6)

        dt_g = timeit(chain(gather_body, iters), x, cal_idx, iters, reps) - dt_nrm
        ns_row = dt_g / e_s * 1e9

        row = {"F": F, "gather_ns_per_row": round(ns_row, 3)}
        for name, adj, e in (("sorted", adj_s, e_s), ("blocked", adj_b, e_b)):
            dt = timeit(chain(step, iters), x, adj, iters, reps) - dt_nrm
            sol = 2 * e * ns_row * 1e-9
            row[f"{name}_edges_per_s_M"] = round(e / dt / 1e6, 1)
            row[f"{name}_vs_gather_sol"] = round(sol / dt, 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
