"""gnn_tpu.train — config, loops, metrics, checkpointing, CLI.

The training subsystem the reference only has in pieces (SURVEY.md §3.3:
loss + optimizers + backward exist, but no loop, no config, no metrics, no
checkpointing, and an empty main()).
"""

from gnn_tpu.train.config import Config, ModelConfig, OptimConfig, TrainConfig
from gnn_tpu.train.loop import build_model, build_optimizer, evaluate, fit
from gnn_tpu.train.metrics import MetricLogger, Throughput

__all__ = [
    "Config",
    "ModelConfig",
    "OptimConfig",
    "TrainConfig",
    "build_model",
    "build_optimizer",
    "evaluate",
    "fit",
    "MetricLogger",
    "Throughput",
]
