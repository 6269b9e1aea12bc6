"""Profiling and roofline accounting.

The reference has zero observability (SURVEY.md §5: no timers, no counters
anywhere). This module provides what the perf work here actually uses:

* :func:`time_fn` — robust device timing (forces completion via a value
  fetch; ``block_until_ready`` is unreliable through proxied backends);
* :func:`trace` — context manager around ``jax.profiler`` for Perfetto
  traces of jitted steps;
* :class:`Roofline` — HBM/MXU speed-of-light accounting so kernel
  benchmarks report fractions of peak, not just times.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Callable

import jax
import numpy as np

__all__ = ["time_fn", "trace", "Roofline", "TPU_V5E"]


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 1) -> float:
    """Median-free simple timing: seconds per call, fully synchronized.

    CAUTION: timing is only as honest as ``fn``'s dataflow. XLA hoists
    loop-invariant work, rewrites slice(gather), and eliminates dead code
    — e.g. ``grad(sum(spmm(x)))`` is constant in x and its forward pass
    vanishes. See docs/PERF.md "Honest measurement" for countermeasures.
    """
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])  # force
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace('/tmp/profile'): step(...)`` -> Perfetto/XPlane dump."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass(frozen=True)
class Chip:
    name: str
    hbm_gbps: float
    bf16_tflops: float
    f32_tflops: float


TPU_V5E = Chip(name="v5e", hbm_gbps=819.0, bf16_tflops=197.0, f32_tflops=49.0)


@dataclass
class Roofline:
    """Accumulate bytes/flops for an op, then score a measured time."""

    bytes_accessed: float = 0.0
    flops: float = 0.0
    chip: Chip = TPU_V5E

    def add_read(self, *shapes_dtypes):
        for shape, dtype in shapes_dtypes:
            self.bytes_accessed += float(np.prod(shape)) * np.dtype(dtype).itemsize
        return self

    add_write = add_read  # same accounting

    def add_matmul(self, m, k, n, passes: int = 1):
        self.flops += 2.0 * m * k * n * passes
        return self

    @property
    def memory_time_s(self) -> float:
        return self.bytes_accessed / (self.chip.hbm_gbps * 1e9)

    def compute_time_s(self, dtype="bfloat16") -> float:
        peak = (
            self.chip.bf16_tflops if dtype == "bfloat16" else self.chip.f32_tflops
        )
        return self.flops / (peak * 1e12)

    def fraction_of_peak(self, measured_s: float, dtype="bfloat16") -> float:
        sol = max(self.memory_time_s, self.compute_time_s(dtype))
        return sol / max(measured_s, 1e-12)
