"""gnn_tpu.optim — optimizers (optax-protocol compatible).

Correct-math equivalents of the reference's SGD/Adam
(src/nn.cpp:387-441; see SURVEY.md §2.8 for the reference's update-rule
bugs, which we intentionally do not replicate).
"""

from gnn_tpu.optim.base import (
    GradientTransformation,
    apply_updates,
    chain,
    clip_by_global_norm,
)
from gnn_tpu.optim.sgd import sgd
from gnn_tpu.optim.adam import adam, adamw

__all__ = [
    "GradientTransformation",
    "apply_updates",
    "chain",
    "clip_by_global_norm",
    "sgd",
    "adam",
    "adamw",
]
