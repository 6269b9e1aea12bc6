"""SDDMM: sampled dense-dense matrix multiply — per-edge scores.

score_e = <a[dst_e], b[src_e]> for each edge e. This is the attention-score
op for GAT (no analog exists in the reference — it has no attention at all;
SURVEY.md §5 "long-context": the graph-domain replacement for sequence
attention is per-edge SDDMM + segment softmax over in-edges). Also the
dw term of SpMM's backward.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["sddmm", "gather_src", "gather_dst"]


def sddmm(
    src: jax.Array,
    dst: jax.Array,
    a: jax.Array,
    b: jax.Array,
    *,
    backend: str = "auto",
) -> jax.Array:
    """Per-edge dot products: out[e] = <a[dst[e]], b[src[e]]>.

    a: [N_dst, F], b: [N_src, F] -> out [E]. Differentiable; the VJP is a
    pair of weighted SpMMs handled natively by XLA (gather -> multiply ->
    scatter-add).
    """
    del backend  # XLA path; a fused Pallas path plugs in via ops.pallas
    return jnp.sum(jnp.take(a, dst, axis=0) * jnp.take(b, src, axis=0), axis=-1)


def gather_src(x: jax.Array, src: jax.Array) -> jax.Array:
    """x_j: features of edge sources (reference message() default x_j,
    include/graph.h:114)."""
    return jnp.take(x, src, axis=0)


def gather_dst(x: jax.Array, dst: jax.Array) -> jax.Array:
    """x_i: features of edge destinations."""
    return jnp.take(x, dst, axis=0)
