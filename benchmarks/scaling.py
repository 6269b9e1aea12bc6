"""Multi-host scaling predictor: comm-volume accounting for the halo exchange.

This 1-chip environment cannot MEASURE pod scaling (BASELINE.md:24 asks for
>=80% edges/s efficiency at 4 hosts), but the communication volume of the
partitioned SpMM is a property of the graph + partition geometry, computable
exactly on the host. This script accounts it and runs it through a
bandwidth/compute roofline model to predict per-P efficiency; the model
constants are the chip numbers measured by bench.py (gather rate) and
published v5e fabric specs (ICI/DCN), both overridable.

Method (per chips P, per direction fwd/bwd):
  * owned rows n_max = align8(ceil(N / P)) per chip (parallel/partition.py);
  * targeted halo ('alltoall'/'overlap'): chip q sends chip p the UNIQUE
    source rows p's local edges need from q — |need[p][q]| rows, exactly
    what parallel.partition._halo_plan ships; the wire moves the PADDED
    [P, H] buffer (H = max pair size, aligned 8), also reported;
  * 'allgather' halo: every chip broadcasts its n_max rows to P-1 peers.

Efficiency model: t(P) = max(compute, comm) with
  compute = local_slots x gather_ns  (the measured SpMM wall)
  comm    = bytes_ici / BW_ici + bytes_dcn / BW_dcn  (links crossing the
            host boundary — chips_per_host chips per host — ride DCN)
and efficiency(P) = t(1) / (P * t(P)) in edges/s terms.

Run:  python benchmarks/scaling.py [--nodes N] [--edges E] [--feat F]
Emits one JSON line per (P, halo mode). Recorded output: docs/SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np


def partition_comm(
    src: np.ndarray, dst: np.ndarray, num_nodes: int, P: int, R_blk: int = 0
) -> dict:
    """Exact per-chip comm/compute accounting for a 1-D node partition.

    ``R_blk``: window size of the distributed blocked layout
    (partition_graph(local_blocked=R)) — owned ranges align to R and local
    intra-window edges (src//R == dst//R) leave the gather path for the
    MXU diagonal blocks; the accounting then also reports the captured /
    remainder split the per-chip compute model needs."""
    align = R_blk if R_blk else 8
    n_max = ((-(-num_nodes // P)) + align - 1) // align * align
    owner_src = np.minimum(src // n_max, P - 1)
    owner_dst = np.minimum(dst // n_max, P - 1)

    rows_raw = np.zeros((P, P), np.int64)  # rows chip q must send chip p
    local_edges = np.zeros(P, np.int64)
    local_cap = np.zeros(P, np.int64)  # blocked-captured local edges
    cap_mask = (src // R_blk == dst // R_blk) if R_blk else None
    for p in range(P):
        m = owner_dst == p
        local_edges[p] = int(m.sum())
        if R_blk:
            # same owner + same window -> dense diagonal block
            local_cap[p] = int((m & (owner_src == p) & cap_mask).sum())
        cols, owners = src[m], owner_src[m]
        for q in range(P):
            if q != p:
                rows_raw[q, p] = len(np.unique(cols[owners == q]))
    h_max = ((int(rows_raw.max()) + 7) // 8) * 8 if P > 1 else 0
    return {
        "n_max": int(n_max),
        "local_edges_max": int(local_edges.max()),
        "local_cap_max": int(local_cap.max()),
        # remainder max taken per chip (the slow and fast chips can differ)
        "local_rem_max": int((local_edges - local_cap).max()),
        "rows_raw": rows_raw,
        "h_max": int(h_max),
    }


def model(
    acc: dict,
    P: int,
    F: int,
    *,
    gather_ns: float,
    bw_ici: float,
    bw_dcn: float,
    chips_per_host: int,
    pad_factor: float,
    bytes_per_el: int = 4,
    block_ns: float = 0.0,
) -> dict:
    """Roofline step-time model from the accounting (both directions)."""
    rows = acc["rows_raw"]
    # padded wire volume of the targeted all_to_all: every pair ships h_max
    pad_rows = acc["h_max"] * (P - 1)
    per_chip_raw = rows.sum(axis=1).max() if P > 1 else 0
    row_bytes = F * bytes_per_el
    # fwd + bwd exchanges per step
    bytes_raw = 2 * per_chip_raw * row_bytes
    bytes_padded = 2 * pad_rows * row_bytes
    # DCN share: pairs whose chips sit on different hosts
    if P > chips_per_host:
        host = np.arange(P) // chips_per_host
        cross = host[:, None] != host[None, :]
        dcn_rows = int((rows * cross).sum(axis=1).max())
        dcn_bytes = 2 * dcn_rows * row_bytes
    else:
        dcn_bytes = 0
    ici_bytes = max(bytes_padded - dcn_bytes, 0)
    t_comm = ici_bytes / bw_ici + dcn_bytes / bw_dcn
    if block_ns > 0:
        # distributed blocked layout: captured local edges ride the MXU at
        # block_ns/edge (measured ~0.17-0.3, docs/PERF.md), only the
        # remainder pays the gather wall
        t_compute = (
            acc["local_cap_max"] * block_ns
            + acc["local_rem_max"] * pad_factor * gather_ns
        ) * 2e-9
    else:
        t_compute = acc["local_edges_max"] * pad_factor * 2 * gather_ns * 1e-9
    t = max(t_comm, t_compute)
    return {
        "halo_rows_raw_per_chip": int(per_chip_raw),
        "halo_MB_padded_per_chip": round(bytes_padded / 1e6, 2),
        "dcn_MB_per_chip": round(dcn_bytes / 1e6, 2),
        "t_comm_ms": round(t_comm * 1e3, 3),
        "t_compute_ms": round(t_compute * 1e3, 3),
        "t_step_ms": round(t * 1e3, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=169_343)
    ap.add_argument("--edges", type=int, default=1_157_799)
    ap.add_argument("--feat", type=int, default=128)
    ap.add_argument("--workload", choices=("random", "clustered"),
                    default="random",
                    help="random power-law = worst-case edge cut (no "
                    "locality); clustered = community-structured graph with "
                    "nodes ordered by community, the regime real graphs "
                    "approach after locality-aware reordering")
    ap.add_argument("--intra", type=float, default=0.95,
                    help="clustered: fraction of edges inside a community")
    ap.add_argument("--gather-ns", type=float, default=2.2,
                    help="measured per-slot gather time (bench.py)")
    ap.add_argument("--bw-ici", type=float, default=180e9,
                    help="per-chip ICI bandwidth, bytes/s (v5e ~180 GB/s)")
    ap.add_argument("--bw-dcn", type=float, default=25e9,
                    help="per-chip DCN bandwidth, bytes/s")
    ap.add_argument("--chips-per-host", type=int, default=8)
    ap.add_argument("--pad-factor", type=float, default=1.06,
                    help="ELL slot padding factor of the local layout")
    ap.add_argument("--local-blocked", type=int, default=0,
                    help="window size R of the distributed blocked layout "
                    "(0 = plain ELL local path); aligns owned ranges to R "
                    "and moves captured intra-window local edges to the "
                    "MXU block rate")
    ap.add_argument("--block-ns", type=float, default=0.25,
                    help="per-edge cost of the MXU diagonal-block path "
                    "(measured 0.17-0.3 ns/edge, docs/PERF.md round 3)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from gnn_tpu import graphs
    from gnn_tpu.graphs.generate import power_law

    if args.workload == "clustered":
        # communities of ~1024 nodes laid out contiguously: a 1-D node
        # partition then cuts only the (1 - intra) inter-community edges
        rng = np.random.default_rng(0)
        comm = 1024
        n_comm = -(-args.nodes // comm)
        s_loc = rng.integers(0, comm, args.edges)
        d_loc = rng.integers(0, comm, args.edges)
        c_s = rng.integers(0, n_comm, args.edges)
        cross = rng.random(args.edges) >= args.intra
        c_d = np.where(cross, rng.integers(0, n_comm, args.edges), c_s)
        ei = np.stack([
            np.minimum(c_s * comm + s_loc, args.nodes - 1),
            np.minimum(c_d * comm + d_loc, args.nodes - 1),
        ])
    else:
        ei = power_law(args.nodes, args.edges, alpha=0.8, seed=0)
    ei, _ = graphs.to_undirected(ei, num_nodes=args.nodes)
    ei, _ = graphs.gcn_norm(ei, num_nodes=args.nodes, self_loops=True)
    src = np.asarray(ei[0], np.int64)
    dst = np.asarray(ei[1], np.int64)
    if args.local_blocked:
        # Mirror the deployed path: fit() repacks nodes with
        # cluster_order(pack_rows=R) BEFORE partitioning (train/loop.py), so
        # the capture accounting must run on the same packed order — on the
        # raw order the R-windows need not align with communities and the
        # prediction would diverge from the deployed layout.
        from gnn_tpu.graphs import cluster_order

        perm = cluster_order(  # new -> old
            np.stack([src, dst]), args.nodes, pack_rows=args.local_blocked
        )
        inv = np.empty_like(perm)
        inv[perm] = np.arange(len(perm))
        src, dst = inv[src], inv[dst]
    E = len(src)

    t1 = None
    for P in (1, 2, 4, 8, 16, 32):
        acc = partition_comm(
            src, dst, args.nodes, P, R_blk=args.local_blocked
        )
        m = model(
            acc, P, args.feat,
            gather_ns=args.gather_ns, bw_ici=args.bw_ici,
            bw_dcn=args.bw_dcn, chips_per_host=args.chips_per_host,
            pad_factor=args.pad_factor,
            block_ns=args.block_ns if args.local_blocked else 0.0,
        )
        if args.local_blocked:
            m["blocked_capture"] = round(
                acc["local_cap_max"] / max(acc["local_edges_max"], 1), 3
            )
        if t1 is None:
            t1 = m["t_step_ms"]
        eff = t1 / (P * m["t_step_ms"]) if m["t_step_ms"] else 1.0
        print(json.dumps({
            "P": P,
            "hosts": max(1, P // args.chips_per_host),
            **m,
            "edges_per_s_total": round(E / (m["t_step_ms"] * 1e-3) / 1e6, 1),
            "efficiency_vs_1chip": round(eff, 3),
        }))


if __name__ == "__main__":
    main()
