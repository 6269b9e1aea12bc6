"""SpMM backend shootout on one graph, one session (VERDICT r4 #7).

Times the fwd+bwd SpMM step through every selectable backend — segment
(XLA scatter), pallas (gather + one-hot kernel), ell, sorted(+hub),
blocked — on arxiv-scale and small graphs, to settle whether the pallas
CSR configuration wins ANY regime (it is dispatched only by explicit
backend='pallas'; 'auto' never picks it).

Run on TPU:  python benchmarks/spmm_backends.py [--quick]
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


def force(a):
    np.asarray(a.ravel()[0])


def nrm(v):
    return v * (1.0 / jnp.max(jnp.abs(v)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    iters = 5 if args.quick else 10
    reps = 2 if args.quick else 3

    from gnn_tpu import graphs
    from gnn_tpu.graphs.generate import power_law
    from gnn_tpu.ops import spmm

    for N, E_dir, F in ((169_343, 1_157_799, 128), (20_000, 120_000, 128)):
        ei = power_law(N, E_dir, alpha=0.8, seed=0)
        ei, _ = graphs.to_undirected(ei, num_nodes=N)
        ei, w = graphs.gcn_norm(ei, num_nodes=N, self_loops=True)
        adj = graphs.build_adjacency(ei, jnp.asarray(w), num_nodes=N)
        adj_s = graphs.build_adjacency(
            ei, jnp.asarray(w), num_nodes=N, reorder=True,
            hub_dense=400 if N > 50_000 else None,
        )
        E = adj.num_edges
        x = jnp.asarray(
            np.random.default_rng(1).normal(size=(N, F)).astype(np.float32)
        )

        from gnn_tpu.ops.pallas.spmm import spmm_pallas

        def run(backend, a):
            def op(a, x):
                if backend == "pallas":  # retired from dispatch; direct
                    return spmm_pallas(a, x)
                return spmm(a, x, backend=backend)

            def step(x, a):
                dx = jax.grad(lambda x: 0.5 * jnp.sum(op(a, x) ** 2))(x)
                return nrm(dx)

            @jax.jit
            def loop(x, a):
                return jax.lax.fori_loop(
                    0, iters, lambda i, x: step(x, a), x
                )

            out = loop(x, a)
            force(out)
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                out = loop(x, a)
                force(out)
                best = min(best, (time.perf_counter() - t0) / iters)
            return best

        row = {"N": N, "E": E, "F": F}
        for backend, a in (
            ("segment", adj),
            ("pallas", adj),
            ("ell", adj),
            ("sorted", adj_s),
        ):
            try:
                dt = run(backend, a)
                row[backend + "_M_edges_per_s"] = round(E / dt / 1e6, 1)
            except Exception as exc:
                row[backend] = f"failed: {exc!r}"[:120]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
