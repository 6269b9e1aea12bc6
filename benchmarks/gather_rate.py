"""Per-slot gather rate vs ELL bucket width K (on-chip calibration).

Measures the time of the ELL inner step — gather [Nb, K, F] rows of x by a
random col table + weighted sum over K — at (nearly) constant total slot
count, for a sweep of widths. Feeds the width-dependent cost model used by
graphs.ell.optimal_buckets (docs/PERF.md: K in {2,4} measured ~10% slower,
unaligned K suspected worse; this pins the numbers).

Honest-measurement rules from docs/PERF.md apply: output is consumed
nonlinearly and fed back into the next iteration so nothing hoists or DCEs.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 169_343
F = 128
SLOTS = 1_200_000
ITERS = 10


def time_k(k: int, x, rng) -> float:
    nb = SLOTS // k
    col = jnp.asarray(rng.integers(0, N, (nb, k)), jnp.int32)
    w = jnp.asarray(rng.random((nb, k), np.float32))

    @jax.jit
    def loop(x):
        def body(_, x):
            part = jnp.sum(
                w[:, :, None] * jnp.take(x, col, axis=0), axis=1
            )  # [nb, F]
            # Nonlinear consumption + feedback: r depends on every slot.
            r = jnp.sum(part * part) / (1.0 + jnp.sum(part * part))
            return x * 0.999 + r * 1e-6

        return jax.lax.fori_loop(0, ITERS, body, x)

    loop(x).block_until_ready()  # compile
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        loop(x).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    out = {}
    for k in (1, 2, 3, 4, 5, 6, 7, 8, 12, 16, 24, 32, 64, 128):
        dt = time_k(k, x, rng)
        slots = (SLOTS // k) * k
        out[k] = dt / slots * 1e9
        print(
            json.dumps(
                {"k": k, "ns_per_slot": round(out[k], 3), "ms": round(dt * 1e3, 2)}
            ),
            flush=True,
        )
    base = min(out.values())
    print("relative:", {k: round(v / base, 3) for k, v in out.items()})


if __name__ == "__main__":
    main()
