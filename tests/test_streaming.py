"""Host-streamed edge-shard aggregation (papers100M-scale path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_tpu import graphs
from gnn_tpu.graphs.streaming import EdgeStream, streaming_spmm


def dense_oracle(ei, w, n, x):
    a = np.zeros((n, n), np.float32)
    np.add.at(a, (ei[1], ei[0]), 1.0 if w is None else w)
    return a @ x


def test_stream_chunks_cover_all_edges(rng):
    n, e = 200, 5000
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    st = EdgeStream(ei, num_nodes=n, chunk_edges=512)
    seen = 0
    for src, dstl, w, d_lo in st.chunks():
        valid = dstl < st.range_rows
        seen += int(valid.sum())
        assert src.shape == (512,) and dstl.shape == (512,)
        # chunk-local dst ids stay inside the fixed range window
        assert dstl[valid].max(initial=0) < st.range_rows
    assert seen == e


def test_streaming_spmm_matches_dense(rng):
    n, e = 300, 4000
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    w = rng.random(e).astype(np.float32)
    x = rng.normal(size=(n, 16)).astype(np.float32)
    st = EdgeStream(ei, w, num_nodes=n, chunk_edges=256)
    assert st.num_chunks > 10  # genuinely streams
    out = np.asarray(streaming_spmm(st, jnp.asarray(x)))
    np.testing.assert_allclose(out, dense_oracle(ei, w, n, x), rtol=1e-4, atol=1e-4)


def test_streaming_spmm_unweighted_single_chunk(rng):
    n, e = 64, 300
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    x = rng.normal(size=(n, 8)).astype(np.float32)
    st = EdgeStream(ei, num_nodes=n, chunk_edges=1 << 20)
    assert st.num_chunks == 1
    out = np.asarray(streaming_spmm(st, jnp.asarray(x)))
    np.testing.assert_allclose(out, dense_oracle(ei, None, n, x), rtol=1e-4, atol=1e-4)


def test_stream_boundary_split_destination(rng):
    """A destination whose edges straddle a chunk boundary accumulates
    correctly (partial sums add across chunks)."""
    n = 16
    # node 5 has 10 in-edges; chunk size 4 splits them across 3 chunks
    src = np.arange(10) % n
    dst = np.full(10, 5)
    ei = np.stack([src, dst])
    x = rng.normal(size=(n, 4)).astype(np.float32)
    st = EdgeStream(ei, num_nodes=n, chunk_edges=4)
    out = np.asarray(streaming_spmm(st, jnp.asarray(x)))
    np.testing.assert_allclose(out, dense_oracle(ei, None, n, x), rtol=1e-5, atol=1e-5)


def test_stream_int_width_audit():
    """Host offsets are int64 (E may exceed 2^31); device ids int32; node
    counts beyond int32 are rejected loudly."""
    ei = np.stack([np.zeros(4, np.int64), np.arange(4, dtype=np.int64)])
    st = EdgeStream(ei, num_nodes=8)
    assert st.src.dtype == np.int32 and st.dst.dtype == np.int32
    # chunk cut arithmetic is python-int / int64 — simulate a huge E cheaply
    assert isinstance(st.num_edges, int)
    with pytest.raises(ValueError, match="int32"):
        EdgeStream(ei, num_nodes=np.iinfo(np.int32).max + 10)


def test_stream_rejects_unsorted_when_assumed(rng):
    ei = np.stack([np.zeros(3, np.int64), np.array([5, 2, 7])])
    with pytest.raises(ValueError, match="not sorted"):
        EdgeStream(ei, num_nodes=8, assume_sorted=True)


def test_device_put_slabbed_roundtrip(rng):
    """Slab-wise forced upload == the plain array (values and dtype),
    for both under- and over-slab-size inputs."""
    from gnn_tpu.graphs.streaming import device_put_slabbed

    small = rng.normal(size=(7, 3)).astype(np.float32)
    big = rng.normal(size=(1000, 16)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(device_put_slabbed(small)), small)
    out = device_put_slabbed(big, slab_bytes=big[:100].nbytes)
    assert out.dtype == big.dtype
    np.testing.assert_array_equal(np.asarray(out), big)


def test_chunks_rle_roundtrip(rng):
    """Run-length counts re-expand to exactly the sorted local dst ids
    (the transfer-halving encoding the device step decodes)."""
    n, e = 150, 3000
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    st = EdgeStream(ei, num_nodes=n, chunk_edges=512)
    for (s1, dstl, _, d1), (s2, counts, _, d2) in zip(
        st.chunks(), st.chunks_rle()
    ):
        assert d1 == d2 and np.array_equal(s1, s2)
        assert counts.sum() == st.chunk_edges
        np.testing.assert_array_equal(
            np.repeat(np.arange(st.range_rows + 1), counts), dstl
        )


def test_streaming_norm_vector_matches_baked_weights(rng):
    """The device-side norm recompute (w_e = norm[src]*norm[dst], no weight
    transfer) equals streaming with the same weights baked per edge."""
    n, e = 200, 3000
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    norm = rng.random(n).astype(np.float32) + 0.5
    w = norm[ei[0]] * norm[ei[1]]
    x = rng.normal(size=(n, 8)).astype(np.float32)
    st_w = EdgeStream(ei, w, num_nodes=n, chunk_edges=256)
    st_n = EdgeStream(ei, num_nodes=n, chunk_edges=256)
    out_w = np.asarray(streaming_spmm(st_w, jnp.asarray(x)))
    out_n = np.asarray(
        streaming_spmm(st_n, jnp.asarray(x), norm=jnp.asarray(norm))
    )
    np.testing.assert_allclose(out_n, out_w, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out_n, dense_oracle(ei, w, n, x), rtol=1e-4, atol=1e-4)
    with pytest.raises(ValueError, match="not both"):
        streaming_spmm(st_w, jnp.asarray(x), norm=jnp.asarray(norm))


def test_streaming_spmm_grad_matches_dense(rng):
    """Trainable streamed SpMM: dx streams the transpose structure and
    matches the dense oracle's gradient (VERDICT r3 item 6: grad-capable
    streaming)."""
    from gnn_tpu.graphs.streaming import streaming_spmm_grad

    n, e = 120, 2000
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    w = rng.random(e).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))
    st = EdgeStream(ei, w, num_nodes=n, chunk_edges=256)
    ts = st.transpose()

    out = np.asarray(streaming_spmm_grad(st, ts, x))
    np.testing.assert_allclose(
        out, dense_oracle(ei, w, n, np.asarray(x)), rtol=1e-4, atol=1e-4
    )
    a = np.zeros((n, n), np.float32)
    np.add.at(a, (ei[1], ei[0]), w)
    a = jnp.asarray(a)
    g_stream = jax.grad(
        lambda x: jnp.sum(jnp.sin(streaming_spmm_grad(st, ts, x)))
    )(x)
    g_dense = jax.grad(lambda x: jnp.sum(jnp.sin(a @ x)))(x)
    np.testing.assert_allclose(
        np.asarray(g_stream), np.asarray(g_dense), rtol=1e-4, atol=1e-4
    )


@pytest.mark.slow
def test_dist_edge_stream_matches_dense(rng):
    """Multi-chip streamed aggregation with host-resident graph AND
    features == dense oracle (VERDICT r3 item 1a: EdgeStream composed with
    the node partition, parity on the 8-device mesh)."""
    from gnn_tpu.graphs.streaming import DistEdgeStream
    from gnn_tpu.parallel import make_mesh

    mesh = make_mesh(axes=("data",))
    P = mesh.shape["data"]
    n, e = 300, 5000
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    w = rng.random(e).astype(np.float32)
    x_host = rng.normal(size=(n, 16)).astype(np.float32)

    dst = DistEdgeStream(ei, w, num_nodes=n, num_parts=P, chunk_edges=128)
    assert dst.num_chunks > 2  # genuinely streams per chip
    out = np.asarray(dst.spmm_host(x_host, mesh))
    np.testing.assert_allclose(
        out, dense_oracle(ei, w, n, x_host), rtol=1e-4, atol=1e-4
    )
    # unweighted path too
    dst0 = DistEdgeStream(ei, num_nodes=n, num_parts=P, chunk_edges=128)
    out0 = np.asarray(dst0.spmm_host(x_host, mesh))
    np.testing.assert_allclose(
        out0, dense_oracle(ei, None, n, x_host), rtol=1e-4, atol=1e-4
    )


@pytest.mark.slow
def test_dist_edge_stream_matches_resident_spmm(rng):
    """Streamed-vs-RESIDENT parity on the mesh (VERDICT r3 item 1a's exact
    ask): DistEdgeStream.spmm_host over host-resident edges+features equals
    spmm_dist over the device-resident partition of the same graph."""
    from gnn_tpu.graphs.streaming import DistEdgeStream
    from gnn_tpu.parallel import (
        make_mesh,
        partition_graph,
        shard_node_array,
        spmm_dist,
    )

    mesh = make_mesh(axes=("data",))
    P = mesh.shape["data"]
    n, e = 200, 2000
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    ei, _ = graphs.coalesce(ei, num_nodes=n)
    ei, w = graphs.gcn_norm(ei, num_nodes=n)
    x = rng.normal(size=(n, 16)).astype(np.float32)
    dist = partition_graph(ei, w, num_nodes=n, num_parts=P)
    x_sh = shard_node_array(dist, x, mesh)
    resident = np.asarray(dist.unshard_nodes(spmm_dist(dist, x_sh, mesh)))

    des = DistEdgeStream(ei, w, num_nodes=n, num_parts=P, chunk_edges=128)
    streamed = np.asarray(des.spmm_host(np.asarray(x), mesh))
    np.testing.assert_allclose(streamed, resident, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_dist_edge_stream_uneven_parts(rng):
    """Heavily skewed dst distribution: chips with few (or zero) edges
    consume all-padding chunks; result still exact."""
    from gnn_tpu.graphs.streaming import DistEdgeStream
    from gnn_tpu.parallel import make_mesh

    mesh = make_mesh(axes=("data",))
    P = mesh.shape["data"]
    n, e = 240, 4000
    # all destinations land on the first chip's range
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n // P, e)])
    x_host = rng.normal(size=(n, 8)).astype(np.float32)
    dst = DistEdgeStream(ei, num_nodes=n, num_parts=P, chunk_edges=256)
    out = np.asarray(dst.spmm_host(x_host, mesh))
    np.testing.assert_allclose(
        out, dense_oracle(ei, None, n, x_host), rtol=1e-4, atol=1e-4
    )


def test_rank_segment_backend_matches_scatter():
    """The scatter-free rank-compact segment sum (the fast device path,
    chunk_edges % 512 == 0) is numerically equivalent to the XLA scatter
    path — including empty segments, hub runs straddling sub-chunk cuts,
    padded trailing chunks, norm and baked-weight variants."""
    rng = np.random.default_rng(7)
    N, E, F = 700, 3000, 12
    # heavy hub + long empty stretches: worst case for rank geometry
    src = rng.integers(0, N, E)
    dst = np.concatenate(
        [np.full(900, 13), rng.integers(0, N, E - 900)]
    )
    x = rng.normal(size=(N, F)).astype(np.float32)
    w = rng.normal(size=E).astype(np.float32)
    for kwargs in (
        {},
        {"edge_weight": w},
        {"norm": np.abs(rng.normal(size=N)).astype(np.float32) + 0.1},
    ):
        norm = kwargs.pop("norm", None)
        stream = EdgeStream(
            np.stack([src, dst]), kwargs.get("edge_weight"),
            num_nodes=N, chunk_edges=1024,
        )
        assert stream.rank_h > 0  # the rank path is actually engaged
        args = dict(norm=None if norm is None else jnp.asarray(norm))
        got = streaming_spmm(
            stream, jnp.asarray(x), segment_backend="rank", **args
        )
        want = streaming_spmm(
            stream, jnp.asarray(x), segment_backend="scatter", **args
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4
        )


@pytest.mark.slow
def test_dist_edge_stream_rank_backend_on_mesh(rng):
    """DistEdgeStream engages the rank-compact segment sum when the chunk
    size tiles RANK_CK — parity vs the dense oracle on the 8-mesh."""
    from gnn_tpu.graphs.streaming import DistEdgeStream
    from gnn_tpu.parallel import make_mesh

    mesh = make_mesh(axes=("data",))
    P = mesh.shape["data"]
    n, e = 400, 9000
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    w = rng.random(e).astype(np.float32)
    x_host = rng.normal(size=(n, 12)).astype(np.float32)
    dst = DistEdgeStream(ei, w, num_nodes=n, num_parts=P, chunk_edges=512)
    assert dst.rank_h > 0  # the rank path is actually engaged
    out = np.asarray(dst.spmm_host(x_host, mesh))
    np.testing.assert_allclose(
        out, dense_oracle(ei, w, n, x_host), rtol=1e-4, atol=1e-4
    )
