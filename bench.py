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
    """Lower-bound HBM traffic for SpMM fwd + dx + dw at f32."""
    idx_w = num_edges * (4 + 4)  # src idx + weight, per edge pass
    feat = N * F * 4
    fwd = idx_w + 2 * feat  # read x, write out
    bwd_dx = num_edges * (4 + 4 + 4) + 2 * feat  # t_perm + idx + w; read g, write dx
    bwd_dw = num_edges * (4 + 4 + 4)  + 2 * feat  # read g, x rows; write dw
    total_bytes = fwd + bwd_dx + bwd_dw
    return total_bytes / (HBM_GBPS * 1e9)


def main():
    from gnn_tpu.ops import spmm

    adj, x = build_workload()
    num_edges = adj.num_edges
    ct = jnp.ones((N, F), jnp.float32)

    @jax.jit
    def step(x, w):
        def f(x, w):
            return jnp.sum(spmm(adj.with_weight(w), x) * ct)

        return jax.grad(f, argnums=(0, 1))(x, w)

    # Warmup / compile.
    dx, dw = step(x, adj.weight)
    jax.block_until_ready((dx, dw))

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        dx, dw = step(x, adj.weight)
    jax.block_until_ready((dx, dw))
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
