"""End-to-end training benchmark: full-graph epochs/s + edges/s per model.

Run on TPU:  python benchmarks/e2e.py [--model gcn|sage|gat] [--quick]

The epoch here is one full-graph training step (fwd + bwd + optimizer) —
the BASELINE.md "ogbn-arxiv epoch time" shape, on the synthetic arxiv-scale
power-law graph (same node count; real ogbn-arxiv loads via
graphs.datasets.load_dataset('ogbn-arxiv', root) when the files exist).
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gcn", choices=["gcn", "sage", "gat"])
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--bf16-messages", action="store_true",
                    help="GAT only: store edge messages in bfloat16 "
                    "(softmax/denominator stay f32)")
    ap.add_argument("--nodes", type=int, default=169_343)
    ap.add_argument("--edges", type=int, default=1_157_799)
    ap.add_argument("--features", type=int, default=128)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--classes", type=int, default=40)
    ap.add_argument(
        "--graph",
        default="powerlaw",
        choices=["powerlaw", "clustered"],
        help="edge structure: pure power-law (no community) or "
        "clustered_power_law with shuffled ids (layouts must discover it)",
    )
    ap.add_argument(
        "--layout",
        default="csr",
        choices=["csr", "sorted", "cluster"],
        help="SpMM layout (static-weight models only): generic ELL, "
        "degree-bucket sorted ELL + hub-dense block, or the "
        "cluster-packed block-diagonal layout (graphs/blocked.py)",
    )
    ap.add_argument(
        "--sol",
        action="store_true",
        help="also calibrate the gather-rate speed-of-light and report "
        "vs_gather_sol (model-specific row-pass accounting, see below)",
    )
    args = ap.parse_args()

    from gnn_tpu import graphs, nn, optim
    from gnn_tpu.graphs.generate import clustered_power_law, power_law
    from gnn_tpu.models import GAT, GCN, GraphSAGE
    from gnn_tpu.utils.profiling import time_fn

    N, F = args.nodes, args.features
    if args.graph == "clustered":
        ei = clustered_power_law(N, args.edges, seed=0)
    else:
        ei = power_law(N, args.edges, seed=0)
    ei, _ = graphs.to_undirected(ei, num_nodes=N)
    norm = "sym" if args.model == "gcn" else None
    data_ei, w = (
        graphs.gcn_norm(ei, num_nodes=N)
        if norm
        else (graphs.add_remaining_self_loops(ei, num_nodes=N)[0], None)
    )
    if args.layout != "csr" and args.model == "gat":
        raise SystemExit(
            "--layout sorted/cluster bakes static weights; GAT's dynamic "
            "attention needs the generic adjacency (--layout csr)"
        )
    layout_kw = {
        "csr": {},
        "sorted": {"reorder": True, "hub_dense": 400},
        "cluster": {"reorder": "cluster", "block_rows": 512},
    }[args.layout]
    adj = graphs.build_adjacency(
        data_ei,
        None if w is None else jnp.asarray(w),
        num_nodes=N,
        **layout_kw,
    )
    # Relabeling layouts speak the permuted node space; the benchmark's x/y
    # are iid random, so no explicit permutation is needed for timing.
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, args.classes, N), jnp.int32)

    key = jax.random.PRNGKey(0)
    if args.model == "gcn":
        model = GCN(F, args.hidden, args.classes, key=key, dropout=0.0)
    elif args.model == "sage":
        model = GraphSAGE(F, args.hidden, args.classes, key=key, dropout=0.0)
    else:
        model = GAT(F, 32, args.classes, key=key, heads=8, dropout=0.0,
                    message_dtype=jnp.bfloat16 if args.bf16_messages else None)

    params, static = nn.partition(model)
    opt = optim.adam(1e-2)
    opt_state = opt.init(params)

    # adj is a jit ARGUMENT, not a closure constant: closure constants embed
    # in the serialized HLO, and the blocked layout's [B, R, R] diag blows
    # the proxied-compile payload limit (HTTP 413) as a constant.
    @jax.jit
    def step(params, opt_state, adj):
        def loss_fn(p):
            logits = nn.combine(p, static)(x, adj)
            return nn.cross_entropy(logits, y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(grads, opt_state, params)
        return optim.apply_updates(params, upd), opt_state, loss

    iters = 3 if args.quick else 10
    dt = time_fn(
        lambda p, o: step(p, o, adj)[0], params, opt_state, iters=iters
    )
    layers = getattr(model, "num_layers", 2)
    out = {
        "bench": f"e2e_epoch[{args.model}]",
        "graph": args.graph,
        "layout": args.layout,
        "epoch_ms": round(dt * 1e3, 2),
        "edges_per_s": round(adj.num_edges * layers / dt, 1),
        "num_edges": adj.num_edges,
        "layers": layers,
    }
    if args.sol:
        # Gather-rate SOL per model, in F-wide random-row passes over the E
        # edges per layer (the binding resource on a power-law graph; scalar
        # per-edge traffic like attention scores is F/1-wide and ignored):
        #   gcn/sage: fwd SpMM gather (1) + bwd transpose-SpMM gather (1) = 2
        #   gat:      fwd SpMM gather (1) + bwd transpose gather (1)
        #             + backward d_alpha SDDMM gathers g[dst], h[src] (2) = 4
        # The dense XW work rides the MXU concurrently and is not counted.
        passes = {"gcn": 2, "sage": 2, "gat": 4}[args.model]
        cal_idx = jnp.asarray(
            rng.integers(0, N, adj.num_edges).astype(np.int32)
        )

        @jax.jit
        def gather_loop(x):
            def body(i, x):
                g = jnp.take(x, cal_idx, axis=0)
                v = x + jnp.sum(g * g, axis=0)[None, :] * 1e-6
                return v * (1.0 / jnp.max(jnp.abs(v)))

            return jax.lax.fori_loop(0, 10, body, x)

        @jax.jit
        def nrm_loop(x):
            def body(i, x):
                v = x + 1.0
                return v * (1.0 / jnp.max(jnp.abs(v)))

            return jax.lax.fori_loop(0, 10, body, x)

        dt_g = (time_fn(gather_loop, x, iters=1) - time_fn(nrm_loop, x, iters=1)) / 10
        ns_per_row = dt_g / adj.num_edges * 1e9
        sol_s = layers * passes * adj.num_edges * ns_per_row * 1e-9
        out["gather_ns_per_row"] = round(ns_per_row, 3)
        out["sol_row_passes_per_layer"] = passes
        out["vs_gather_sol"] = round(sol_s / dt, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
