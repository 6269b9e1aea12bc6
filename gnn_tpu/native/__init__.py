"""gnn_tpu.native — C++ graph-core bindings (ctypes).

Host-side preprocessing hot paths in C++ (see graph_native.cpp), compiled
on first use with g++ and loaded via ctypes. Every entry point has a numpy
fallback, so the framework works without a toolchain; the native path is
the production one for 100M+-edge graphs.

API: ``available()``, ``sort_edges_csr``, ``degrees``,
``sample_neighbors_host``, ``coalesce_sorted``, ``partition_by_edges``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional, Tuple

import numpy as np

__all__ = [
    "available",
    "sort_edges_csr",
    "degrees",
    "sample_neighbors_host",
    "partition_by_edges",
    "label_propagation",
    "louvain_cluster",
    "refine_windows",
    "cluster_pack",
]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "graph_native.cpp")
_SO = os.path.join(_HERE, f"_graph_native_{sys.implementation.cache_tag}.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _compile() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i64p = ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.sort_edges_csr.restype = ctypes.c_int64
        lib.sort_edges_csr.argtypes = [
            ctypes.c_int64, ctypes.c_int64, i64p, i64p, i64p, i64p,
        ]
        lib.degrees.restype = None
        lib.degrees.argtypes = [ctypes.c_int64, ctypes.c_int64, i64p, f32p, f64p]
        lib.sample_neighbors.restype = None
        lib.sample_neighbors.argtypes = [
            i64p, i64p, ctypes.c_int64, i64p, ctypes.c_int64,
            ctypes.c_uint64, ctypes.c_int64, i64p,
        ]
        lib.coalesce_sorted.restype = ctypes.c_int64
        lib.coalesce_sorted.argtypes = [
            ctypes.c_int64, i64p, i64p, f32p, i64p, i64p, f32p,
        ]
        lib.partition_by_edges.restype = None
        lib.partition_by_edges.argtypes = [
            ctypes.c_int64, ctypes.c_int64, i64p, i64p,
        ]
        lib.label_propagation.restype = ctypes.c_int64
        lib.label_propagation.argtypes = [
            ctypes.c_int64, i64p, i64p, f32p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_uint64, i64p,
        ]
        lib.cluster_pack.restype = None
        lib.cluster_pack.argtypes = [
            ctypes.c_int64, ctypes.c_int64, i64p, ctypes.c_int64, i64p,
        ]
        lib.refine_windows.restype = ctypes.c_int64
        lib.refine_windows.argtypes = [
            ctypes.c_int64, i64p, i64p, ctypes.c_int64, ctypes.c_int64, i64p,
        ]
        lib.louvain_cluster.restype = ctypes.c_int64
        lib.louvain_cluster.argtypes = [
            ctypes.c_int64, i64p, i64p, f32p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_double, ctypes.c_uint64, i64p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _i64(a: np.ndarray):
    return np.ascontiguousarray(a, np.int64)


def _ptr(a: np.ndarray, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def sort_edges_csr(
    src: np.ndarray, dst: np.ndarray, num_nodes: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Stable (dst major, src minor) edge sort. Returns (perm, row_ptr).
    O(E + N) counting sort natively; numpy lexsort fallback."""
    src, dst = _i64(src), _i64(dst)
    lib = _load()
    if lib is not None:
        perm = np.empty(len(src), np.int64)
        row_ptr = np.empty(num_nodes + 1, np.int64)
        rc = lib.sort_edges_csr(
            num_nodes, len(src),
            _ptr(src, ctypes.c_int64), _ptr(dst, ctypes.c_int64),
            _ptr(perm, ctypes.c_int64), _ptr(row_ptr, ctypes.c_int64),
        )
        if rc == 0:
            return perm, row_ptr
        raise ValueError("edge ids out of range")
    perm = np.lexsort((src, dst))
    row_ptr = np.zeros(num_nodes + 1, np.int64)
    np.add.at(row_ptr, dst + 1, 1)
    return perm, np.cumsum(row_ptr)


def degrees(
    nodes: np.ndarray, num_nodes: int, weight: Optional[np.ndarray] = None
) -> np.ndarray:
    nodes = _i64(nodes)
    lib = _load()
    if lib is not None:
        out = np.zeros(num_nodes, np.float64)
        w = None if weight is None else np.ascontiguousarray(weight, np.float32)
        lib.degrees(
            num_nodes, len(nodes), _ptr(nodes, ctypes.c_int64),
            None if w is None else _ptr(w, ctypes.c_float),
            _ptr(out, ctypes.c_double),
        )
        return out
    out = np.zeros(num_nodes, np.float64)
    np.add.at(out, nodes, 1.0 if weight is None else weight)
    return out


def sample_neighbors_host(
    row_ptr: np.ndarray,
    col: np.ndarray,
    seeds: np.ndarray,
    fanout: int,
    *,
    seed: int = 0,
    replace: bool = True,
) -> np.ndarray:
    """Uniform neighbor sampling on the host. Without replacement pads
    short rows with -1 (the on-device sampler in graphs.sampling is the
    with-replacement static-shape variant)."""
    row_ptr, col, seeds = _i64(row_ptr), _i64(col), _i64(seeds)
    lib = _load()
    out = np.empty((len(seeds), fanout), np.int64)
    if lib is not None:
        lib.sample_neighbors(
            _ptr(row_ptr, ctypes.c_int64), _ptr(col, ctypes.c_int64),
            len(seeds), _ptr(seeds, ctypes.c_int64), fanout,
            ctypes.c_uint64(seed), 1 if replace else 0,
            _ptr(out, ctypes.c_int64),
        )
        return out
    rng = np.random.default_rng(seed)
    for i, v in enumerate(seeds):
        lo, hi = row_ptr[v], row_ptr[v + 1]
        deg = hi - lo
        if deg == 0:
            out[i] = -1
            out[i, 0] = v
        elif replace:
            out[i] = col[lo + rng.integers(0, deg, fanout)]
        elif deg <= fanout:
            out[i, :deg] = col[lo:hi]
            out[i, deg:] = -1
        else:
            out[i] = col[lo + rng.choice(deg, fanout, replace=False)]
    return out


def label_propagation(
    row_ptr: np.ndarray,
    col: np.ndarray,
    *,
    weight: Optional[np.ndarray] = None,
    n_iters: int = 10,
    max_size: int = 0,
    seed: int = 0,
) -> Tuple[np.ndarray, int]:
    """Community detection by size-capped label propagation over a CSR
    graph (labels init to node ids; each sweep adopts the neighborhood's
    plurality label, skipping communities already at ``max_size``).

    Returns ``(label [N] int64 compacted to 0..k-1, k)``. The numpy
    fallback runs the same sweeps vectorized per-node-batch; results may
    differ between backends (both are valid clusterings — label
    propagation is seed-dependent by nature)."""
    row_ptr, col = _i64(row_ptr), _i64(col)
    n_nodes = len(row_ptr) - 1
    lib = _load()
    if lib is not None:
        out = np.empty(n_nodes, np.int64)
        w = None if weight is None else np.ascontiguousarray(weight, np.float32)
        k = lib.label_propagation(
            n_nodes, _ptr(row_ptr, ctypes.c_int64), _ptr(col, ctypes.c_int64),
            None if w is None else _ptr(w, ctypes.c_float),
            n_iters, max_size, ctypes.c_uint64(seed),
            _ptr(out, ctypes.c_int64),
        )
        return out, int(k)
    # numpy fallback: sequential sweeps with a per-node plurality vote.
    rng = np.random.default_rng(seed)
    label = np.arange(n_nodes, dtype=np.int64)
    size = np.ones(n_nodes, np.int64)
    w = np.ones(len(col), np.float64) if weight is None else np.asarray(
        weight, np.float64
    )
    dst_of = np.repeat(np.arange(n_nodes), np.diff(row_ptr))
    for _ in range(n_iters):
        moves = 0
        for v in rng.permutation(n_nodes):
            lo, hi = row_ptr[v], row_ptr[v + 1]
            if lo == hi:
                continue
            nb = col[lo:hi]
            keep = nb != v
            if not keep.any():
                continue
            labs, inv = np.unique(label[nb[keep]], return_inverse=True)
            votes = np.bincount(inv, weights=w[lo:hi][keep])
            cur = label[v]
            cur_votes = votes[labs == cur][0] if (labs == cur).any() else 0.0
            ok = (
                np.ones(len(labs), bool)
                if max_size <= 0
                else (size[labs] < max_size) | (labs == cur)
            )
            if not ok.any():
                continue
            # plurality with smallest-label tie-break among allowed labels
            vmask = np.where(ok, votes, -np.inf)
            best = labs[np.lexsort((labs, -vmask))[0]]
            if vmask[labs == best][0] > cur_votes or (
                vmask[labs == best][0] == cur_votes and best < cur
            ):
                if best != cur:
                    size[cur] -= 1
                    size[best] += 1
                    label[v] = best
                    moves += 1
        if moves == 0:
            break
    del dst_of
    _, compact = np.unique(label, return_inverse=True)
    # re-id in order of first appearance by node id (matches native)
    first = {}
    out = np.empty(n_nodes, np.int64)
    k = 0
    for v in range(n_nodes):
        l = int(compact[v])
        if l not in first:
            first[l] = k
            k += 1
        out[v] = first[l]
    return out, k


def partition_by_edges(row_ptr: np.ndarray, num_parts: int) -> np.ndarray:
    """Contiguous node-range partition balanced by in-edge count."""
    row_ptr = _i64(row_ptr)
    n_nodes = len(row_ptr) - 1
    lib = _load()
    if lib is not None:
        out = np.empty(num_parts + 1, np.int64)
        lib.partition_by_edges(
            n_nodes, num_parts, _ptr(row_ptr, ctypes.c_int64),
            _ptr(out, ctypes.c_int64),
        )
        return out
    total = row_ptr[-1]
    targets = total * np.arange(1, num_parts) // num_parts
    bounds = np.searchsorted(row_ptr[:-1], targets, side="left")
    return np.concatenate([[0], bounds, [n_nodes]])


def louvain_cluster(
    row_ptr: np.ndarray,
    col: np.ndarray,
    *,
    weight: Optional[np.ndarray] = None,
    max_levels: int = 10,
    max_sweeps: int = 10,
    max_size: int = 0,
    resolution: float = 1.0,
    seed: int = 0,
) -> Tuple[np.ndarray, int]:
    """Size-capped Louvain community detection (graph_native.cpp
    louvain_cluster): modularity local moves + graph aggregation, with a
    community NODE-count cap so every community stays packable into an
    R-row device window. Beats plurality label propagation on planted
    partitions (measured: +0.05 edge capture at arxiv scale — the
    null-model term breaks the plurality ties LP stalls on).

    CSR over the symmetrized graph; weights, if given, must be positive
    (zero-sum rows would confuse the sparse accumulators). Returns
    ``(label [N] compacted 0..k-1, k)``. No Python port: without the
    native toolchain this falls back to :func:`label_propagation` (same
    contract, lower capture)."""
    row_ptr, col = _i64(row_ptr), _i64(col)
    n_nodes = len(row_ptr) - 1
    lib = _load()
    if lib is None:
        return label_propagation(
            row_ptr, col, weight=weight, max_size=max_size, seed=seed
        )
    out = np.empty(n_nodes, np.int64)
    w = None if weight is None else np.ascontiguousarray(weight, np.float32)
    k = lib.louvain_cluster(
        n_nodes, _ptr(row_ptr, ctypes.c_int64), _ptr(col, ctypes.c_int64),
        None if w is None else _ptr(w, ctypes.c_float),
        int(max_levels), int(max_sweeps), int(max_size),
        ctypes.c_double(resolution), ctypes.c_uint64(seed),
        _ptr(out, ctypes.c_int64),
    )
    return out, int(k)


def refine_windows(
    row_ptr: np.ndarray,
    col: np.ndarray,
    win: np.ndarray,
    n_windows: int,
    *,
    n_sweeps: int = 2,
) -> Tuple[np.ndarray, int]:
    """Kernighan–Lin-style greedy swap refinement of a window assignment
    (graph_native.cpp refine_windows; exact-parity Python fallback below).

    ``win[v]`` is node v's window; swaps node pairs between windows (window
    sizes fixed) to raise the intra-window edge fraction. Votes use
    IN-edges of the CSR (``col[row_ptr[v]:row_ptr[v+1]]`` = v's in-
    neighbors): exact greedy on degree-symmetric graphs (to_undirected),
    heuristic otherwise. Deterministic. Returns (new win, swap count)."""
    row_ptr, col = _i64(row_ptr), _i64(col)
    win = np.ascontiguousarray(win, np.int64).copy()
    n = len(row_ptr) - 1
    lib = _load()
    if lib is not None:
        swaps = lib.refine_windows(
            n, _ptr(row_ptr, ctypes.c_int64), _ptr(col, ctypes.c_int64),
            int(n_windows), int(n_sweeps), _ptr(win, ctypes.c_int64),
        )
        return win, int(swaps)
    # Python fallback: the identical deterministic algorithm (same visit
    # order, FIFO pairing, discard-on-fail), so results match exactly.
    total = 0
    for _ in range(n_sweeps):
        pending: dict = {}
        swaps = 0
        for v in range(n):
            nb = col[row_ptr[v] : row_ptr[v + 1]]
            nb = nb[nb != v]
            if len(nb) == 0:
                continue
            wins, counts = np.unique(win[nb], return_counts=True)
            A = win[v]
            cur = int(counts[wins == A][0]) if (wins == A).any() else 0
            # plurality, smallest-window tie-break, must beat the home count
            order = np.lexsort((wins, -counts))
            B, bestc = int(wins[order[0]]), int(counts[order[0]])
            g_v = bestc - cur
            if B == A or g_v <= 0:
                continue
            q = pending.get((B, A))
            swapped = False
            while q:
                u = q.pop(0)
                if win[u] != B:
                    continue  # stale
                nu = col[row_ptr[u] : row_ptr[u + 1]]
                nu = nu[nu != u]
                g_u = int((win[nu] == A).sum() - (win[nu] == B).sum())
                m_uv = int((nu == v).sum())
                if g_v + g_u - 2 * m_uv > 0:
                    win[v], win[u] = B, A
                    swaps += 1
                    swapped = True
                    break
            if not swapped:
                pending.setdefault((A, B), []).append(v)
        total += swaps
        if swaps == 0:
            break
    return win, total


def cluster_pack(labels: np.ndarray, rows: int):
    """First-fit-decreasing packing of label groups into ``rows``-node
    windows (graphs/blocked.py cluster_pack_order semantics). Returns the
    new -> old node permutation, or None when the native core is
    unavailable (caller falls back to the Python packer)."""
    labels = _i64(labels)
    lib = _load()
    if lib is None:
        return None
    n = len(labels)
    n_labels = int(labels.max()) + 1 if n else 0
    out = np.empty(n, np.int64)
    lib.cluster_pack(
        n, n_labels, _ptr(labels, ctypes.c_int64), int(rows),
        _ptr(out, ctypes.c_int64),
    )
    return out
