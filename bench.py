"""Headline benchmark: GCN-normalized SpMM, forward + backward, one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

* Workload: ogbn-arxiv-scale synthetic power-law graph (N=169,343 nodes —
  arxiv's node count — E ~2.5M directed edges after symmetrization + self
  loops), F=128 features, exact GCN sym-norm edge weights. One benchmark
  step = SpMM forward + full backward dx (the transpose SpMM), i.e. the
  per-layer sparse work of GCN training: loss = 0.5*||A x||^2 so that
  grad = A^T (A x) exercises both passes.
* value: edges/s through that fwd+bwd step (higher is better).

Measurement methodology (hard-won; see docs/PERF.md "Honest measurement"):
the step is chained inside one jitted fori_loop with the (normalized)
gradient fed back as the next iteration's input. Without that feedback a
linear workload lets XLA hoist the entire gradient out of the loop (it is
loop-invariant) and dead-code-eliminate the forward pass, silently inflating
throughput ~5x. The small normalization cost is calibrated and subtracted.

* vs_baseline: fraction of the *gather-rate speed-of-light*, calibrated on
  the same chip in the same run. Random-row gather is the binding hardware
  resource for SpMM on power-law graphs with no locality (measured here:
  ~2.5 ns/row for 512 B rows, ~200 GB/s effective vs 819 GB/s peak HBM on
  v5e; insensitive to dtype and locality — it is an index-rate limit, not a
  bandwidth limit). SOL = 2 passes x E rows x measured ns/row. The reference
  publishes no numbers (BASELINE.md), so the roofline is the baseline.
  BASELINE.json target: vs_baseline >= 0.9.
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


def build_workload():
    from gnn_tpu import graphs
    from gnn_tpu.graphs.generate import power_law

    ei = power_law(N, E_DIRECTED, alpha=0.8, seed=0)
    ei, _ = graphs.to_undirected(ei, num_nodes=N)
    ei, w = graphs.gcn_norm(ei, num_nodes=N, self_loops=True)
    # reorder=True selects the combine-free degree-bucket layout
    # (graphs/sorted_ell.py); x below is already in the relabeled node space
    # (random iid, so no explicit permutation is needed). hub_dense=400
    # absorbs sources gathered >=400 times into an MXU dense block (f32 —
    # measured optimal: bf16/larger blocks lose to the [N,H] matmul's
    # latency, and the f32 break-even degree on this chip is ~400).
    adj = graphs.build_adjacency(
        ei, jnp.asarray(w), num_nodes=N, reorder=True, hub_dense=400
    )
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(N, F)).astype(np.float32)
    )
    return adj, x


def _chain(body, iters):
    """Run body iters times inside ONE executable, each iteration depending
    on the last (defeats loop-invariant hoisting and amortizes the ~3 ms
    per-dispatch overhead of the device tunnel)."""

    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, iters, lambda i, x: body(x), x)

    return loop


def _time(loop, x, iters, reps=3):
    out = loop(x)
    np.asarray(out[0, 0])  # force completion (block_until_ready is
    # unreliable through the axon relay)
    best = float("inf")
    for _ in range(reps):  # min-of-reps: run-to-run variance is ~10-20%
        t0 = time.perf_counter()
        out = loop(x)
        np.asarray(out[0, 0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def _normalize(v):
    return v * (1.0 / jnp.max(jnp.abs(v)))


def main():
    from gnn_tpu.ops import spmm

    adj, x = build_workload()
    num_edges = adj.num_edges
    iters = 20

    # --- calibration 1: feedback-normalization overhead ---------------------
    dt_nrm = _time(_chain(lambda x: _normalize(x + 1.0), iters), x, iters)

    # --- calibration 2: the chip's random-row gather rate (the roofline) ----
    # Gather num_edges random rows and consume EVERY row with a NONLINEAR
    # reduction: a linear one (plain sum) is algebraically equal to
    # counts @ x and XLA exploits that; a sliced consumer lets XLA rewrite
    # slice(gather) -> gather(slice). Either silently skips the gather.
    cal_idx = jnp.asarray(
        np.random.default_rng(2).integers(0, N, num_edges).astype(np.int32)
    )

    def gather_body(x):
        g = jnp.take(x, cal_idx, axis=0)
        return _normalize(x + jnp.sum(g * g, axis=0)[None, :] * 1e-6)

    dt_gather = _time(_chain(gather_body, iters), x, iters) - dt_nrm
    ns_per_row = dt_gather / num_edges * 1e9

    # Calibration sanity (docs/PERF.md roadmap #5): the measured per-row
    # gather rate for 512 B rows sits at ~2-4 ns on this chip class. A value
    # far outside that band means the calibration itself was optimized away
    # (or the run is not measuring the chip) — refuse to print a bogus
    # vs_baseline rather than silently record one.
    import sys

    if not (1.5 <= ns_per_row <= 4.5):
        print(
            f"bench: calibrated gather rate {ns_per_row:.2f} ns/row is "
            "outside the expected [1.5, 4.5] band",
            file=sys.stderr,
        )
    if not (0.8 <= ns_per_row <= 10.0):
        raise SystemExit(
            f"bench: gather-rate calibration insane ({ns_per_row:.2f} "
            "ns/row) — the SOL denominator cannot be trusted"
        )

    # --- the measured step: SpMM forward + backward dx ----------------------
    def step(x):
        dx = jax.grad(lambda x: 0.5 * jnp.sum(spmm(adj, x) ** 2))(x)
        return _normalize(dx)

    dt = _time(_chain(step, iters), x, iters) - dt_nrm

    sol = 2 * num_edges * ns_per_row * 1e-9  # two gather-bound passes
    print(
        json.dumps(
            {
                "metric": "spmm_fwd_bwd_edges_per_s",
                "value": round(num_edges / dt, 1),
                "unit": "edges/s",
                "vs_baseline": round(sol / dt, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
