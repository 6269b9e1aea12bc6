"""Gather-rate edge aggregation (ops/edge_agg.py): the slot-table path
that replaces the one-hot Pallas kernel for dynamic-weight reductions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_tpu.ops.edge_agg import build_edge_agg, edge_aggregate


def _random_sorted_graph(rng, n, e, hub_degree=0):
    dst = np.sort(rng.integers(0, n, e))
    if hub_degree:
        dst = np.sort(np.concatenate([dst, np.full(hub_degree, n // 2)]))
    src = rng.integers(0, n, len(dst))
    return src.astype(np.int64), dst.astype(np.int64)


@pytest.mark.parametrize("hub", [0, 1400])
def test_edge_aggregate_matches_segment_sum(rng, hub):
    n, e = 300, 4000
    src, dst = _random_sorted_graph(rng, n, e, hub_degree=hub)
    E = len(dst)
    lay = build_edge_agg(dst, n, E)
    msg = jnp.asarray(rng.normal(size=(E, 20)).astype(np.float32))
    got = edge_aggregate(msg, lay)
    want = jax.ops.segment_sum(msg, jnp.asarray(dst), n, indices_are_sorted=True)
    # atol scales with hub degree: f32 accumulation ORDER differs between
    # the bucketed sums and the sequential scatter
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-4 + hub * 3e-7
    )


def test_edge_aggregate_grad_is_dst_gather(rng):
    n, e = 120, 900
    src, dst = _random_sorted_graph(rng, n, e)
    lay = build_edge_agg(dst, n, e)
    msg = jnp.asarray(rng.normal(size=(e, 6)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))

    g = jax.grad(lambda m: jnp.sum(edge_aggregate(m, lay) * t))(msg)
    want = jax.grad(
        lambda m: jnp.sum(
            jax.ops.segment_sum(m, jnp.asarray(dst), n, indices_are_sorted=True)
            * t
        )
    )(msg)
    np.testing.assert_allclose(np.asarray(g), np.asarray(want), atol=1e-5)


def test_edge_aggregate_transpose_positions(rng):
    """The transpose layout folds the dst->src permutation into its slots:
    aggregating a CANONICAL-order edge array by SOURCE node equals the
    unsorted scatter oracle."""
    n, e = 250, 3000
    src, dst = _random_sorted_graph(rng, n, e)
    E = len(dst)
    t_perm = np.lexsort((dst, src))  # canonical -> src-sorted positions
    lay_t = build_edge_agg(src[t_perm], n, E, positions=t_perm)
    msg = rng.normal(size=(E, 8)).astype(np.float32)
    got = edge_aggregate(jnp.asarray(msg), lay_t)
    want = np.zeros((n, 8), np.float32)
    np.add.at(want, src, msg)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
    # and its VJP gathers by the canonical edge's SOURCE
    t = rng.normal(size=(n, 8)).astype(np.float32)
    g = jax.grad(
        lambda m: jnp.sum(edge_aggregate(m, lay_t) * jnp.asarray(t))
    )(jnp.asarray(msg))
    np.testing.assert_allclose(np.asarray(g), t[src], atol=1e-5)


def test_edge_aggregate_empty_and_padding_rows(rng):
    """Zero-degree nodes produce zero rows; slot padding never leaks."""
    dst = np.asarray([2, 2, 2, 5, 5, 9], np.int64)
    src = np.zeros(6, np.int64)
    lay = build_edge_agg(dst, 12, 6)
    msg = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
    out = np.asarray(edge_aggregate(msg, lay))
    want = np.zeros((12, 4), np.float32)
    np.add.at(want, dst, np.asarray(msg))
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_edge_aggregate_max_matches_segment_max(rng):
    n, e = 200, 2500
    src, dst = _random_sorted_graph(rng, n, e, hub_degree=1200)
    from gnn_tpu.ops.edge_agg import edge_aggregate_max

    E = len(dst)
    lay = build_edge_agg(dst, n, E)
    msg = jnp.asarray(rng.normal(size=(E, 8)).astype(np.float32))
    got = np.asarray(edge_aggregate_max(msg, lay))
    want = np.asarray(
        jax.ops.segment_max(msg, jnp.asarray(dst), n, indices_are_sorted=True)
    )
    np.testing.assert_array_equal(got, want)  # max is order-exact
