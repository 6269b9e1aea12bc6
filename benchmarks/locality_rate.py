"""Gather-rate physics: locality and feature-width sweeps (on-chip).

Decides the round-2 perf strategy (docs/PERF.md roadmap #1):

* locality sweep — ns/row of a [S, F] random gather when the indices are
  drawn uniformly vs from per-block windows of shrinking radius vs fully
  sorted. If locality buys a materially better rate, clustered/RCM node
  reordering converts real-graph community structure into faster SpMM.
* feature-width sweep — ns/row at F in {64, 128, 256, 512}. The index-rate
  wall is per-row; wider rows amortize it until the gather goes
  bandwidth-bound (~2 KB rows on v5e: 819 GB/s ~ 2.4 ns/row).

Honest-measurement rules from docs/PERF.md: nonlinear consumption +
feedback so nothing hoists or DCEs.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 169_343
S = 1_200_000
ITERS = 10


def time_gather(col, x) -> float:
    col = jnp.asarray(col, jnp.int32)

    @jax.jit
    def loop(x):
        def body(_, x):
            g = jnp.take(x, col, axis=0)  # [S, F]
            r = jnp.sum(g * g)
            r = r / (1.0 + r)
            return x * 0.999 + r * 1e-6

        return jax.lax.fori_loop(0, ITERS, body, x)

    loop(x).block_until_ready()
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        loop(x).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def main():
    rng = np.random.default_rng(0)
    results = {}

    # -- locality sweep at F=128 (the bench.py operating point) -------------
    x = jnp.asarray(rng.normal(size=(N, 128)).astype(np.float32))
    uniform = rng.integers(0, N, S)
    for name, col in (
        ("uniform", uniform),
        ("sorted", np.sort(uniform)),
        # Block-local: consecutive runs of 1024 slots draw from a node
        # window of the given radius (models a clustered/RCM reordering).
        ("window_16k", None),
        ("window_2k", None),
        ("window_256", None),
    ):
        if col is None:
            radius = int(name.split("_")[1].replace("k", "000"))
            nblk = S // 1024
            base = rng.integers(0, max(N - radius, 1), nblk)
            col = (
                base[:, None] + rng.integers(0, radius, (nblk, 1024))
            ).reshape(-1)
        dt = time_gather(col, x)
        results[name] = dt / S * 1e9
        print(json.dumps({"case": name, "ns_per_row": round(results[name], 3)}), flush=True)

    # -- feature-width sweep, uniform indices --------------------------------
    for f in (64, 128, 256, 512):
        xf = jnp.asarray(rng.normal(size=(N, f)).astype(np.float32))
        dt = time_gather(uniform, xf)
        ns = dt / S * 1e9
        gbps = S * f * 4 / dt / 1e9
        print(
            json.dumps(
                {"case": f"F{f}", "ns_per_row": round(ns, 3), "GB_s": round(gbps, 1)}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
