"""Headline benchmark: GCN-normalized CSR SpMM, forward + backward, one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

* Workload: ogbn-arxiv-scale synthetic power-law graph (N=169,343 nodes —
  arxiv's node count — E ~2.3M directed edges after symmetrization + self
  loops), F=128 features, exact GCN sym-norm edge weights. One benchmark
  step = SpMM forward + full backward (transpose SpMM for dx + SDDMM for
  dw), i.e. exactly the per-layer work of GCN training.
* value: edges/s through that fwd+bwd step (higher is better).
* vs_baseline: fraction of the per-chip memory-bandwidth speed-of-light.
  The reference publishes no numbers (BASELINE.md), so the baseline is the
  roofline itself: SOL time = minimum HBM traffic / peak BW, where minimum
  traffic for fwd+bwd of SpMM counts each tensor moved once per pass:
  3 edge passes (fwd, dx, dw) each touching E*(idx+weight) bytes plus the
  node-feature reads/writes. BASELINE.json target: vs_baseline >= 0.9.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# ogbn-arxiv scale
N = 169_343
E_DIRECTED = 1_157_799
F = 128
HBM_GBPS = 819.0  # TPU v5e peak HBM bandwidth (GB/s)


def build_workload():
    from gnn_tpu import graphs
    from gnn_tpu.graphs.generate import power_law

    ei = power_law(N, E_DIRECTED, alpha=0.8, seed=0)
    ei, _ = graphs.to_undirected(ei, num_nodes=N)
    ei, w = graphs.gcn_norm(ei, num_nodes=N, self_loops=True)
    adj = graphs.build_adjacency(ei, jnp.asarray(w), num_nodes=N)
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(N, F)).astype(np.float32)
    )
    return adj, x


def speed_of_light_s(num_edges: int) -> float:
    """Lower-bound HBM traffic for SpMM fwd + backward dx at f32 (the two
    sparse passes a GCN training step actually runs per layer; the norm
    weights are frozen constants, so there is no dw pass). Minimum traffic
    per pass: every index+weight once, every feature row read once, every
    output row written once."""
    idx_w = num_edges * (4 + 4)
    feat = N * F * 4
    per_pass = idx_w + 2 * feat
    return 2 * per_pass / (HBM_GBPS * 1e9)


def main():
    from gnn_tpu.ops import spmm

    adj, x = build_workload()
    num_edges = adj.num_edges
    ct = jnp.ones((N, F), jnp.float32)

    iters = 20

    @jax.jit
    def loop(x):
        # Chain iterations inside one executable so per-dispatch overhead
        # (~3 ms through the axon tunnel) doesn't pollute the measurement.
        def body(_, x):
            return jax.grad(lambda x: jnp.sum(spmm(adj, x) * ct))(x)

        return jax.lax.fori_loop(0, iters, body, x)

    # Warmup / compile.
    out = loop(x)
    np.asarray(out[0, 0])  # force full completion (block_until_ready is
    # unreliable through the axon relay)

    t0 = time.perf_counter()
    out = loop(x)
    np.asarray(out[0, 0])
    dt = (time.perf_counter() - t0) / iters

    edges_per_s = num_edges / dt
    sol = speed_of_light_s(num_edges)
    print(
        json.dumps(
            {
                "metric": "spmm_fwd_bwd_edges_per_s",
                "value": round(edges_per_s, 1),
                "unit": "edges/s",
                "vs_baseline": round(sol / dt, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
