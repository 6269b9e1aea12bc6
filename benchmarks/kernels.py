"""Kernel benchmark suite — one JSON line per kernel/backend.

Run on TPU:  python benchmarks/kernels.py  [--quick]

Covers the sparse hot ops across backends on an ogbn-arxiv-scale synthetic
power-law graph: SpMM (ELL vs XLA segment), sorted segment-sum (Pallas
one-hot MXU vs XLA scatter), edge gather, and the fused GAT layer step.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def emit(name, seconds, edges, extra=None):
    rec = {
        "bench": name,
        "ms": round(seconds * 1e3, 3),
        "edges_per_s": round(edges / seconds, 1),
    }
    if extra:
        rec.update(extra)
    print(json.dumps(rec))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--nodes", type=int, default=169_343)
    ap.add_argument("--edges", type=int, default=1_157_799)
    ap.add_argument("--features", type=int, default=128)
    args = ap.parse_args()

    from gnn_tpu import graphs, nn
    from gnn_tpu.graphs.generate import power_law
    from gnn_tpu.ops import spmm
    from gnn_tpu.ops.segment import segment_sum_edges
    from gnn_tpu.utils.profiling import time_fn

    N, F = args.nodes, args.features
    iters = 3 if args.quick else 10

    ei = power_law(N, args.edges, seed=0)
    ei, _ = graphs.to_undirected(ei, num_nodes=N)
    ei, w = graphs.gcn_norm(ei, num_nodes=N)
    adj = graphs.build_adjacency(ei, jnp.asarray(w), num_nodes=N)
    E = adj.num_edges
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    msg = jnp.asarray(rng.normal(size=(E, F)).astype(np.float32))

    # SpMM forward
    for backend in ("ell", "segment"):
        f = jax.jit(lambda x, b=backend: spmm(adj, x, backend=b))
        emit(f"spmm_fwd[{backend}]", time_fn(f, x, iters=iters), E)

    # SpMM fwd + dx (GCN training work). Quadratic loss: grad(sum(spmm(x)))
    # is constant in x, so XLA dead-codes the forward pass entirely
    # (docs/PERF.md "Honest measurement").
    for backend in ("ell", "segment"):
        f = jax.jit(
            lambda x, b=backend: jax.grad(
                lambda x: 0.5 * jnp.sum(spmm(adj, x, backend=b) ** 2)
            )(x)
        )
        emit(f"spmm_fwd_bwd[{backend}]", time_fn(f, x, iters=iters), E)

    # sorted segment-sum: pallas one-hot MXU vs XLA scatter
    f_p = jax.jit(lambda m: segment_sum_edges(m, adj, backend="pallas"))
    emit("segment_sum[pallas]", time_fn(f_p, msg, iters=iters), E)
    f_x = jax.jit(
        lambda m: jax.ops.segment_sum(m, adj.dst, N, indices_are_sorted=True)
    )
    emit("segment_sum[xla]", time_fn(f_x, msg, iters=iters), E)

    # GAT layer step
    from gnn_tpu.mp import GATConv

    conv = GATConv(F, 16, key=jax.random.PRNGKey(0), heads=8)
    params, static = nn.partition(conv)
    f_gat = jax.jit(
        lambda p, x: jax.grad(
            lambda p: jnp.sum(nn.combine(p, static)(x, adj) ** 2)
        )(p)
    )
    emit("gat_layer_fwd_bwd", time_fn(f_gat, params, x, iters=iters), E)


if __name__ == "__main__":
    main()
