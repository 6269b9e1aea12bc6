"""Config system.

The reference has NO config surface — every hyperparameter is a constructor
argument and main() is empty (SURVEY.md §5: "Config / flag system: ABSENT";
main.cpp:32-36). Here: one small dataclass tree, JSON-serializable, with CLI
override support (``--optim.lr 0.01`` style), per the BASELINE.json configs.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

__all__ = ["ModelConfig", "OptimConfig", "TrainConfig", "DistConfig", "Config"]


@dataclass
class ModelConfig:
    name: str = "gcn"  # gcn | sage | gat | encoder_gcn | gin
    hidden: int = 64
    num_layers: int = 2
    dropout: float = 0.5
    heads: int = 8  # gat only
    aggr: str = "mean"  # sage only


@dataclass
class OptimConfig:
    name: str = "adam"  # adam | adamw | sgd
    lr: float = 0.01
    weight_decay: float = 0.0
    momentum: float = 0.9  # sgd only
    grad_clip: float = 0.0


@dataclass
class TrainConfig:
    epochs: int = 200
    seed: int = 0
    batch_size: int = 0  # 0 = full graph
    fanouts: List[int] = field(default_factory=lambda: [10, 5])
    eval_every: int = 10
    # Node reordering for the single-chip full-graph SpMM fast paths:
    # "auto" uses the combine-free degree-bucket layout when the graph is
    # degree-symmetric (graphs/sorted_ell.py; ~1.5x), "true"/"false" force
    # it on/off, and "cluster" uses the community-packed block-diagonal
    # layout (graphs/blocked.py; intra-community aggregation on the MXU —
    # the fastest path for community-structured graphs).
    reorder: str = "auto"
    checkpoint_dir: str = ""
    checkpoint_every: int = 0  # 0 = only final
    log_file: str = ""
    patience: int = 0  # early stopping on val accuracy; 0 = off
    # Sampled minibatches with HOST-resident features (papers100M regime:
    # x exceeds HBM). Sampling + feature gather run on the host
    # (train/host_loader.py, memmap-friendly); only the [batch_nodes, F]
    # slab transfers per step. Requires batch_size > 0.
    host_features: bool = False


@dataclass
class DistConfig:
    """Multi-chip full-graph training knobs (graph-partition parallelism).

    ``num_parts``: 0/1 = single chip; N > 1 partitions nodes + edges over an
    N-way ``data`` mesh axis (N must divide into the available devices).
    ``halo``: feature-exchange strategy — allgather | alltoall | overlap
    (see parallel.partition_graph).
    ``cluster_order``: relabel nodes by discovered community before
    partitioning (graphs.cluster_order), so the contiguous node-range
    partition cuts between communities — shrinks the halo toward the
    graph's inter-community edge fraction (docs/SCALING.md).
    ``local_blocked``: window size R > 0 additionally bakes each chip's
    local intra-window edges into dense [B, R, R] MXU blocks (the
    distributed cluster-packed layout; implies halo='overlap' and packs
    the cluster order into R-row windows — see
    parallel.partition_graph(local_blocked=...))."""

    num_parts: int = 0
    axis_name: str = "data"
    halo: str = "alltoall"
    cluster_order: bool = False
    local_blocked: int = 0


@dataclass
class Config:
    dataset: str = "sbm"
    data_root: str = "data"
    model: ModelConfig = field(default_factory=ModelConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    dist: DistConfig = field(default_factory=DistConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, s: str) -> "Config":
        return cls.from_dict(json.loads(s))

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        return cls(
            dataset=d.get("dataset", "sbm"),
            data_root=d.get("data_root", "data"),
            model=ModelConfig(**d.get("model", {})),
            optim=OptimConfig(**d.get("optim", {})),
            train=TrainConfig(**d.get("train", {})),
            dist=DistConfig(**d.get("dist", {})),
        )

    def apply_overrides(self, overrides: Sequence[str]) -> "Config":
        """Apply ``section.key=value`` strings (CLI dotted overrides)."""
        cfg = Config.from_dict(json.loads(self.to_json()))
        for ov in overrides:
            if "=" not in ov:
                raise ValueError(f"override '{ov}' is not key=value")
            key, value = ov.split("=", 1)
            parts = key.split(".")
            target = cfg
            for p in parts[:-1]:
                if not hasattr(target, p):
                    raise ValueError(f"unknown config section '{p}'")
                target = getattr(target, p)
            leaf = parts[-1]
            if not hasattr(target, leaf):
                raise ValueError(f"unknown config key '{key}'")
            current = getattr(target, leaf)
            if isinstance(current, bool):
                parsed = value.lower() in ("1", "true", "yes")
            elif isinstance(current, int):
                parsed = int(value)
            elif isinstance(current, float):
                parsed = float(value)
            elif isinstance(current, list):
                parsed = json.loads(value)
            else:
                parsed = value
            setattr(target, leaf, parsed)
        return cfg
