"""Synthetic graph generators.

The reference builds graphs by hand in tests (tests/graph.test.cpp:19-36) and
ships no datasets (SURVEY.md §3.5). These generators provide deterministic,
dependency-free graphs for e2e tests and benchmarks:

* :func:`stochastic_block_model` — planted-community graphs whose labels a
  GCN can recover (the Cora-like correctness workload);
* :func:`random_regular` / :func:`power_law` — structure-only graphs with
  controlled degree distributions for kernel benchmarking (power-law matches
  the skew of real citation/product graphs like ogbn-arxiv).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from gnn_tpu.graphs.data import Data
from gnn_tpu.graphs.transforms import coalesce, remove_self_loops, to_undirected

__all__ = ["stochastic_block_model", "random_regular", "power_law", "karate_club"]


def stochastic_block_model(
    num_nodes: int = 200,
    num_classes: int = 4,
    *,
    p_in: float = 0.05,
    p_out: float = 0.002,
    feature_dim: int = 16,
    feature_noise: float = 1.0,
    train_frac: float = 0.3,
    val_frac: float = 0.2,
    seed: int = 0,
) -> Data:
    """SBM with class-informative Gaussian features and split masks."""
    rng = np.random.default_rng(seed)
    y = rng.integers(0, num_classes, num_nodes)
    # Sample edges blockwise from upper triangle.
    iu, ju = np.triu_indices(num_nodes, k=1)
    same = y[iu] == y[ju]
    prob = np.where(same, p_in, p_out)
    keep = rng.random(len(iu)) < prob
    src, dst = iu[keep], ju[keep]
    ei = np.stack([src, dst]).astype(np.int64)
    ei, _ = to_undirected(ei, num_nodes=num_nodes)
    # Features: class centroid + noise.
    centroids = rng.normal(size=(num_classes, feature_dim)) * 2.0
    x = centroids[y] + feature_noise * rng.normal(size=(num_nodes, feature_dim))
    # Split masks.
    perm = rng.permutation(num_nodes)
    n_train = int(train_frac * num_nodes)
    n_val = int(val_frac * num_nodes)
    train_mask = np.zeros(num_nodes, bool)
    val_mask = np.zeros(num_nodes, bool)
    test_mask = np.zeros(num_nodes, bool)
    train_mask[perm[:n_train]] = True
    val_mask[perm[n_train : n_train + n_val]] = True
    test_mask[perm[n_train + n_val :]] = True
    return Data(
        x=x.astype(np.float32),
        edge_index=ei,
        y=y.astype(np.int32),
        num_nodes=num_nodes,
        train_mask=train_mask,
        val_mask=val_mask,
        test_mask=test_mask,
    )


def random_regular(
    num_nodes: int, degree: int, *, seed: int = 0
) -> np.ndarray:
    """Approximately d-regular directed edge list [2, N*d] (with replacement,
    self-loops removed, duplicates coalesced)."""
    rng = np.random.default_rng(seed)
    src = np.repeat(np.arange(num_nodes), degree)
    dst = rng.integers(0, num_nodes, num_nodes * degree)
    ei, _ = remove_self_loops(np.stack([src, dst]))
    ei, _ = coalesce(ei, num_nodes=num_nodes)
    return ei


def power_law(
    num_nodes: int,
    num_edges: int,
    *,
    alpha: float = 0.8,
    seed: int = 0,
) -> np.ndarray:
    """Edge list with power-law destination popularity (preferential-
    attachment-like skew), matching real-graph degree distributions."""
    rng = np.random.default_rng(seed)
    # Zipf-ish popularity over nodes, sampled by inverse CDF (rng.choice with
    # explicit probabilities is orders of magnitude slower at this scale).
    ranks = np.arange(1, num_nodes + 1, dtype=np.float64)
    popularity = ranks ** (-alpha)
    cdf = np.cumsum(popularity)
    cdf /= cdf[-1]
    src = rng.integers(0, num_nodes, num_edges)
    dst = np.searchsorted(cdf, rng.random(num_edges))
    ei, _ = remove_self_loops(np.stack([src, dst]).astype(np.int64))
    ei, _ = coalesce(ei, num_nodes=num_nodes)
    return ei


def karate_club() -> Data:
    """Zachary's karate club (34 nodes, 78 undirected edges, 2 factions) —
    the classic tiny ground-truth graph, embedded for tests/demos."""
    edges = [
        (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8),
        (0, 10), (0, 11), (0, 12), (0, 13), (0, 17), (0, 19), (0, 21),
        (0, 31), (1, 2), (1, 3), (1, 7), (1, 13), (1, 17), (1, 19),
        (1, 21), (1, 30), (2, 3), (2, 7), (2, 8), (2, 9), (2, 13),
        (2, 27), (2, 28), (2, 32), (3, 7), (3, 12), (3, 13), (4, 6),
        (4, 10), (5, 6), (5, 10), (5, 16), (6, 16), (8, 30), (8, 32),
        (8, 33), (9, 33), (13, 33), (14, 32), (14, 33), (15, 32),
        (15, 33), (18, 32), (18, 33), (19, 33), (20, 32), (20, 33),
        (22, 32), (22, 33), (23, 25), (23, 27), (23, 29), (23, 32),
        (23, 33), (24, 25), (24, 27), (24, 31), (25, 31), (26, 29),
        (26, 33), (27, 33), (28, 31), (28, 33), (29, 32), (29, 33),
        (30, 32), (30, 33), (31, 32), (31, 33), (32, 33),
    ]
    labels = np.array(
        [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 0, 0, 0, 0, 1, 1, 0, 0, 1, 0,
         1, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1], np.int32
    )
    ei = np.array(edges, np.int64).T
    ei, _ = to_undirected(ei, num_nodes=34)
    x = np.eye(34, dtype=np.float32)  # one-hot features
    return Data(x=x, edge_index=ei, y=labels, num_nodes=34)
