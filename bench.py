"""Headline benchmark: GCN-normalized SpMM, forward + backward, one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Two workloads, both arxiv-scale (N=169,343 / E ~2.5M undirected+loops,
F=128), measured in the same run on the same chip:

* PRIMARY (``metric``/``value``/``vs_baseline``, kept stable across rounds):
  locality-FREE power-law graph through the combine-free sorted-ELL layout.
  One step = SpMM forward + full backward dx (loss = 0.5*||A x||^2 so
  grad = A^T (A x) exercises both passes).
* SECONDARY (``blocked_*`` fields): clustered power-law graph (node ids
  shuffled; the layout must DISCOVER the communities via label propagation)
  through the cluster-packed block-diagonal layout (graphs/blocked.py,
  R=512 bf16 blocks) — intra-community edges aggregate on the MXU with no
  gather at all. ``blocked_vs_gather_sol > 1`` means faster than ANY
  gather-based SpMM can be on this chip.

Measurement methodology (hard-won; see docs/PERF.md "Honest measurement"):
each step is chained inside one jitted fori_loop with the (normalized)
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
* The calibrated rate swings 10-20% between sessions (the tunnel + chip
  share state); to keep the denominator honest the calibration runs THREE
  times, interleaved with the measured workloads, and the MEDIAN ns/row is
  used and recorded in the JSON (``gather_ns_per_row``) for auditability.
* ``blocked_vs_gather_sol``: with the round-5 bucket remainder
  (graphs/blocked.py rem_backend='bucket') the secondary reproduces —
  313.2 / 313.7 M edges/s in two same-day sessions (0.2% on edges/s;
  1.335 / 1.300 on the SOL fraction, the delta being the calibration
  itself). ``blocked_vs_shape_roof`` reports the step against both
  passes of the in-run-measured dense-einsum probe + the remainder at
  gather SOL — an auditably-ideal floor (~0.34-0.39 achieved), measured
  INTERLEAVED rep-for-rep with the step so numerator and denominator
  share session weather (VERDICT r4 #2).
"""

from __future__ import annotations

import json
import os
import sys
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


def build_blocked_workload():
    """Clustered arxiv-scale graph (shuffled ids) through the cluster-packed
    blocked layout — the benchmarks/blocked.py workload at its measured-best
    config (R=512, bf16 blocks; docs/PERF.md round-3 table)."""
    from gnn_tpu import graphs
    from gnn_tpu.graphs.generate import clustered_power_law

    ei = clustered_power_law(
        N, E_DIRECTED, avg_community=200, intra_frac=0.85, seed=0
    )
    ei, _ = graphs.to_undirected(ei, num_nodes=N)
    ei, w = graphs.gcn_norm(ei, num_nodes=N, self_loops=True)
    adj = graphs.build_adjacency(
        ei,
        jnp.asarray(w),
        num_nodes=N,
        reorder="cluster",
        block_rows=512,
        block_dtype=jnp.bfloat16,
    )
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(N, F)).astype(np.float32)
    )
    return adj, x, int(ei.shape[1])


def _chain(body, iters):
    """Run body iters times inside ONE executable, each iteration depending
    on the last (defeats loop-invariant hoisting and amortizes the ~3 ms
    per-dispatch overhead of the device tunnel). The adjacency/indices are
    CLOSURE constants: embedding them in the lowered module lets XLA
    constant-fold layout decisions — measured ~25% faster than passing them
    as jit arguments for the sorted-ELL + hub-dense primary."""

    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, iters, lambda i, x: body(x), x)

    return loop


def _chain_op(body, iters):
    """Operand-as-argument variant for the blocked layout, whose
    few-hundred-MB diag tensor would overflow the remote-compile transport
    if embedded as a closure constant (same rationale as
    benchmarks/blocked.py)."""

    @jax.jit
    def loop(x, operand):
        return jax.lax.fori_loop(0, iters, lambda i, x: body(x, operand), x)

    return loop


def _time(loop, x, iters, operand=None, reps=3):
    args = (x,) if operand is None else (x, operand)
    out = loop(*args)
    np.asarray(out[0, 0])  # force completion (block_until_ready is
    # unreliable through the axon relay)
    best = float("inf")
    for _ in range(reps):  # min-of-reps: run-to-run variance is ~10-20%
        t0 = time.perf_counter()
        out = loop(*args)
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
    # Run three times, INTERLEAVED with the measured workloads below, and
    # use the median — one calibration sample is one session-noise draw.
    cal_idx = jnp.asarray(
        np.random.default_rng(2).integers(0, N, num_edges).astype(np.int32)
    )

    def gather_body(x):
        g = jnp.take(x, cal_idx, axis=0)
        return _normalize(x + jnp.sum(g * g, axis=0)[None, :] * 1e-6)

    gather_loop = _chain(gather_body, iters)

    def calibrate():
        dt = _time(gather_loop, x, iters) - dt_nrm
        return dt / num_edges * 1e9

    # --- the measured step: SpMM forward + backward dx ----------------------
    def step(x):
        dx = jax.grad(lambda x: 0.5 * jnp.sum(spmm(adj, x) ** 2))(x)
        return _normalize(dx)

    t_start = time.perf_counter()
    cal_samples = [calibrate()]
    dt = _time(_chain(step, iters), x, iters) - dt_nrm
    cal_samples.append(calibrate())

    # --- secondary: the clustered/blocked workload --------------------------
    # Time guard: the secondary (graph gen + cluster prep + compile) adds
    # several minutes; if this run is already slow (cold caches, tunnel
    # weather), skip it rather than risk an external timeout killing the
    # run before the PRIMARY metric prints. Override: GNN_TPU_BENCH_BUDGET
    # (seconds from the first calibration; <=0 disables the secondary).
    blocked = {}
    budget = float(os.environ.get("GNN_TPU_BENCH_BUDGET", 420))
    elapsed = time.perf_counter() - t_start
    if budget <= 0 or elapsed > budget:
        print(
            f"bench: skipping blocked secondary ({elapsed:.0f}s elapsed vs "
            f"budget {budget:.0f}s)",
            file=sys.stderr,
        )
    else:
        try:
            adj_b, x_b, e_blocked = build_blocked_workload()

            def step_b(x, adj_op):
                dx = jax.grad(lambda x: 0.5 * jnp.sum(spmm(adj_op, x) ** 2))(x)
                return _normalize(dx)

            # --- session-robust denominator (VERDICT r4 #2) -------------
            # The MXU-path rate swings ~20% between chip sessions while the
            # gather calibration stays flat, so a fixed "1.2x gather SOL"
            # bar is session weather. Fix: measure an MXU *shape-roof*
            # probe — the layout's own [B, R, R] x [B, R, F] batched
            # einsum on synthetic operands, chained with feedback like
            # every other measurement here — INTERLEAVED rep-for-rep with
            # the blocked step, and report the step as a fraction of
            # 2 x roof_einsum + 2 x remainder-gather-SOL. Numerator and
            # denominator then move with the session together
            # (docs/PERF.md: interleaved A/B probes are stable to ~3%
            # while sequential sessions swing 20%).
            lay = adj_b.blocked
            Bb, Rb, _ = lay.diag.shape
            rng_b = np.random.default_rng(7)
            diag_syn = jnp.asarray(
                rng_b.normal(size=(Bb, Rb, Rb)).astype(np.float32)
            ).astype(lay.diag.dtype)

            def roof_body(xw, diag_op):
                y = jnp.einsum(
                    "brw,bwf->brf",
                    diag_op,
                    xw.astype(diag_op.dtype),
                    preferred_element_type=jnp.float32,
                )
                return _normalize(y)

            roof_loop = _chain_op(roof_body, iters)
            xw0 = jnp.asarray(
                rng_b.normal(size=(Bb, Rb, F)).astype(np.float32)
            )
            step_loop = _chain_op(step_b, iters)
            # interleaved min-of-6: one blocked rep, one roof rep, repeat
            dt_b = dt_roof = float("inf")
            _time(step_loop, x_b, iters, operand=adj_b, reps=1)  # warm both
            _time(roof_loop, xw0, iters, operand=diag_syn, reps=1)
            for _ in range(6):
                dt_b = min(
                    dt_b,
                    _time(step_loop, x_b, iters, operand=adj_b, reps=1),
                )
                dt_roof = min(
                    dt_roof,
                    _time(roof_loop, xw0, iters, operand=diag_syn, reps=1),
                )
            dt_b -= dt_nrm
            dt_roof -= dt_nrm
            rem_edges = (
                lay.num_rem_edges
                if not lay.use_levels
                else lay.num_level_slots
            )
            blocked = {
                "dt": dt_b,
                "edges": e_blocked,
                "roof_einsum": dt_roof,
                "rem_edges": int(rem_edges),
            }
        except Exception as exc:  # never let the secondary sink the primary
            print(f"bench: blocked workload failed: {exc!r}", file=sys.stderr)
    cal_samples.append(calibrate())

    ns_per_row = float(np.median(cal_samples))

    # Calibration sanity (docs/PERF.md roadmap #5): the measured per-row
    # gather rate for 512 B rows sits at ~2-4 ns on this chip class. A value
    # far outside that band means the calibration itself was optimized away
    # (or the run is not measuring the chip) — refuse to print a bogus
    # vs_baseline rather than silently record one. The bands encode the
    # CURRENT chip class + 512 B rows; override via env for other hardware
    # (ADVICE r3), e.g. GNN_TPU_BENCH_BAND="0.4,20" GNN_TPU_BENCH_WARN_BAND=
    # "0.8,9".
    def _band(env, default):
        raw = os.environ.get(env)
        if not raw:
            return default
        lo, hi = (float(v) for v in raw.split(","))
        return lo, hi

    warn_lo, warn_hi = _band("GNN_TPU_BENCH_WARN_BAND", (1.5, 4.5))
    hard_lo, hard_hi = _band("GNN_TPU_BENCH_BAND", (0.8, 10.0))
    if not (warn_lo <= ns_per_row <= warn_hi):
        print(
            f"bench: calibrated gather rate {ns_per_row:.2f} ns/row is "
            f"outside the expected [{warn_lo}, {warn_hi}] band",
            file=sys.stderr,
        )
    if not (hard_lo <= ns_per_row <= hard_hi):
        raise SystemExit(
            f"bench: gather-rate calibration insane ({ns_per_row:.2f} "
            f"ns/row vs band [{hard_lo}, {hard_hi}]) — the SOL denominator "
            "cannot be trusted (override band via GNN_TPU_BENCH_BAND=lo,hi "
            "on different hardware)"
        )

    sol = 2 * num_edges * ns_per_row * 1e-9  # two gather-bound passes
    out = {
        "metric": "spmm_fwd_bwd_edges_per_s",
        "value": round(num_edges / dt, 1),
        "unit": "edges/s",
        "vs_baseline": round(sol / dt, 4),
        "gather_ns_per_row": round(ns_per_row, 3),
        "gather_ns_samples": [round(v, 3) for v in cal_samples],
    }
    if blocked:
        sol_b = 2 * blocked["edges"] * ns_per_row * 1e-9
        out["blocked_edges_per_s"] = round(blocked["edges"] / blocked["dt"], 1)
        out["blocked_vs_gather_sol"] = round(sol_b / blocked["dt"], 4)
        # Shape-roof fraction (session-robust): floor = both passes of the
        # layout's own dense einsum at the rate measured THIS session,
        # interleaved with the step, + the remainder at gather SOL.
        roof = (
            2 * blocked["roof_einsum"]
            + 2 * blocked["rem_edges"] * ns_per_row * 1e-9
        )
        out["blocked_vs_shape_roof"] = round(roof / blocked["dt"], 4)
        out["blocked_roof_einsum_ms"] = round(blocked["roof_einsum"] * 1e3, 3)
        out["blocked_rem_edges"] = blocked["rem_edges"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
