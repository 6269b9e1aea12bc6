"""Pallas-backed CSR SpMM: XLA gather + one-hot MXU segment reduction.

STATUS: EXPERIMENTAL / measured-out (round 5). Against every other
backend in one session (benchmarks/spmm_backends.py) this configuration
wins no regime — 2x the XLA scatter, but always under the ELL layouts
(48 vs 93 M edges/s at arxiv scale, 30 vs 35 at 20k nodes) because the
one-hot reduction burns R x C x F MACs where slot tables pay only the
gather rate. It is no longer reachable via ops.spmm(backend=...); import
spmm_pallas directly. The underlying kernel (ops/pallas/segment.py)
remains the production path for GAT numerators and the blocked
remainder, where no static-weight ELL formulation applies.

This is the "CSR SpMM Pallas kernel" configuration of BASELINE.md. The
TPU-native split of work (measured on v5e, docs/PERF.md):

* the per-edge feature-row **gather stays in XLA**: random-row access is
  bound by the chip's gather/index unit (~2.5 ns/row, insensitive to dtype
  and locality). A Pallas alternative would need one DMA descriptor per
  row (~50-100 ns each) — 20-40x slower. There is nothing to win there.
* the per-destination **reduction runs in Pallas**: XLA's scatter-add is
  ~12x off roofline, while the one-hot MXU formulation
  (ops/pallas/segment.py) reduces a sorted chunk of edges with a single
  [R, C] x [C, F] matmul per chunk — zero scatter, f32-grade accuracy via
  the bf16 hi+lo split.

Semantics match ops.spmm (reference: the dense ``adj.mm(x)`` aggregation
at src/graph.cpp:204-212, done sparse): out[d] = sum_{e=(s->d)} w_e x[s].
Backward uses the transpose chunk plan so dx is also a sorted reduction,
and dw is the SDDMM <g[dst], x[src]>.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["spmm_pallas"]


def _lane_pad(flat):
    width = flat.shape[1]
    pad = (-width) % 128  # Mosaic DMA wants lane-aligned rows
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((flat.shape[0], pad), flat.dtype)], axis=1
        )
    return flat, width


def _reduce(values, plan, num_nodes, interpret, ids):
    from gnn_tpu.ops.pallas.segment import segment_sum_sorted

    flat, width = _lane_pad(values)
    out = segment_sum_sorted(
        flat, plan, num_nodes, dst_sorted=ids, interpret=interpret
    )
    return out[:, :width]


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _spmm_pallas(interpret, n_src, n_dst, x, weight, src, dst, t_perm, plan, t_plan):
    out, _ = _spmm_pallas_fwd(
        interpret, n_src, n_dst, x, weight, src, dst, t_perm, plan, t_plan
    )
    return out


def _spmm_pallas_fwd(
    interpret, n_src, n_dst, x, weight, src, dst, t_perm, plan, t_plan
):
    msg = jnp.take(x, src, axis=0)
    if weight is not None:
        msg = msg * weight[:, None].astype(msg.dtype)
    out = _reduce(msg, plan, n_dst, interpret, dst).astype(x.dtype)
    return out, (x, weight, src, dst, t_perm, plan, t_plan)


def _spmm_pallas_bwd(interpret, n_src, n_dst, res, g):
    x, weight, src, dst, t_perm, plan, t_plan = res
    # dx = A^T g: gather g rows straight into src-sorted order so the
    # transpose reduction is also sorted (no unsorted scatter anywhere).
    gmsg = jnp.take(g, jnp.take(dst, t_perm), axis=0)
    if weight is not None:
        gmsg = gmsg * jnp.take(weight, t_perm)[:, None].astype(gmsg.dtype)
    dx = _reduce(
        gmsg, t_plan, n_src, interpret, jnp.take(src, t_perm)
    ).astype(x.dtype)
    if weight is None:
        dw = None
    else:
        dw = jnp.sum(
            jnp.take(g, dst, axis=0) * jnp.take(x, src, axis=0), axis=-1
        ).astype(weight.dtype)
    return dx, dw, None, None, None, None, None


_spmm_pallas.defvjp(_spmm_pallas_fwd, _spmm_pallas_bwd)


def spmm_pallas(adj, x, *, interpret: bool = False):
    """out = A @ x with the reduction on the Pallas one-hot MXU kernel.

    Differentiable in ``x`` and ``adj.weight``. Requires the adjacency's
    chunk plans (built by ``build_adjacency(..., layout='ell')``); falls
    back to the XLA sorted-segment path for graphs too small to chunk.
    """
    if adj.chunk_plan is None or adj.t_chunk_plan is None:
        raise ValueError(
            "spmm backend 'pallas' needs chunk plans: build the adjacency "
            "with build_adjacency(..., layout='ell')"
        )
    if x.ndim != 2:
        raise ValueError(f"spmm expects x of rank 2 [N, F], got {x.shape}")
    # Mosaic compiles for TPU only; the CPU (test) platform runs the
    # kernel through the Pallas interpreter.
    interpret = interpret or jax.default_backend() == "cpu"
    return _spmm_pallas(
        interpret,
        adj.num_src_nodes,
        adj.num_dst_nodes,
        x,
        adj.weight,
        adj.src,
        adj.dst,
        adj.t_perm,
        adj.chunk_plan,
        adj.t_chunk_plan,
    )
