"""GAT layer decomposition: named fwd+bwd pieces on the real chip.

VERDICT r4 #1(a): the ~350 ms backward was attributed only as
"transpose-sorted reductions + d_alpha SDDMM". This times each piece of
one attention layer ([E, H x Fh]) separately, with the honest-measurement
chained-feedback methodology of bench.py, so the layer cost decomposes
into auditable rows — before/after the edge_agg slot-table aggregation
replaced the one-hot kernel.

Run on TPU:  python benchmarks/gat_decomp.py [--kernel] (--kernel forces
the round-4 Pallas path for the A/B).
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
H, FH = 8, 32  # heads x head width (the e2e GAT config)


def force(a):
    np.asarray(a.ravel()[0])


def chain(body, iters=10):
    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, iters, lambda i, x: body(x), x)

    return loop


def timeit(loop, x, iters=10, reps=3):
    out = loop(x)
    force(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = loop(x)
        force(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kernel", action="store_true",
                    help="disable edge_agg (round-4 Pallas kernel path)")
    args = ap.parse_args()

    from gnn_tpu import graphs
    from gnn_tpu.graphs.generate import power_law
    from gnn_tpu.mp.gat import GATConv

    ei = power_law(N, E_DIRECTED, alpha=0.8, seed=0)
    ei, _ = graphs.to_undirected(ei, num_nodes=N)
    ei, _ = graphs.gcn_norm(ei, num_nodes=N, self_loops=True)
    adj = graphs.build_adjacency(ei, num_nodes=N)
    if args.kernel:
        adj = adj.replace(edge_agg=None, t_edge_agg=None)
    E = adj.num_edges
    conv = GATConv(H * FH, FH, heads=H, key=jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(N, H * FH)).astype(np.float32)
    )
    print(json.dumps({"edges": E, "HF": H * FH,
                      "path": "kernel" if args.kernel else "edge_agg"}),
          flush=True)

    def nrm(v):
        return v * (1.0 / jnp.max(jnp.abs(v)))

    dt_nrm = timeit(chain(lambda x: nrm(x + 1.0)), x)

    rows = {}

    # full layer forward
    rows["layer_fwd"] = timeit(chain(lambda x: nrm(conv(x, adj))), x) - dt_nrm

    # full layer fwd + bwd
    def fb(x):
        g = jax.grad(lambda x: 0.5 * jnp.sum(conv(x, adj) ** 2))(x)
        return nrm(g)

    rows["layer_fwd_bwd"] = timeit(chain(fb), x) - dt_nrm

    # pieces (each on a [N, H*F]-shaped carrier, consumed nonlinearly)
    from gnn_tpu.ops.gather import gather_src_edges
    from gnn_tpu.ops.segment import segment_sum_edges
    from gnn_tpu.mp.gat import _segment_max_shift

    def src_gather_fwd(x):
        g = gather_src_edges(x, adj)
        return nrm(x + jnp.sum(g * g, axis=0)[None, :] * 1e-6)

    rows["src_gather_E_rows"] = timeit(chain(src_gather_fwd), x) - dt_nrm

    def src_gather_bwd(x):
        # the VJP reduction alone: d_x of sum(gather(x) * const-ish)
        g = jax.grad(
            lambda x: jnp.sum(jnp.abs(gather_src_edges(x, adj)))
        )(x)
        return nrm(x + g * 1e-6)

    rows["src_gather_fwd_plus_vjp"] = timeit(chain(src_gather_bwd), x) - dt_nrm

    def agg_fwd(x):
        msg = gather_src_edges(x, adj)  # [E, HF] carrier
        out = segment_sum_edges(msg, adj)
        return nrm(x + out * 1e-6)

    rows["gather_plus_agg_fwd"] = timeit(chain(agg_fwd), x) - dt_nrm

    def maxshift(x):
        e = gather_src_edges(x[:, : H], adj)  # [E, H] scores stand-in
        m = _segment_max_shift(adj, e)
        return nrm(x + jnp.sum(m * m) * 1e-9)

    rows["scores_gather_plus_maxshift"] = timeit(chain(maxshift), x) - dt_nrm

    out = {k: round(v * 1e3, 2) for k, v in rows.items()}
    out["epoch_equiv_2layer_ms"] = round(rows["layer_fwd_bwd"] * 2 * 1e3, 1)
    out["edges_per_s_2layer"] = round(2 * E / (2 * rows["layer_fwd_bwd"]) / 1e6, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
