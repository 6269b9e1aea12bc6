"""Embedding table.

The reference declares an ``nn::Embedding`` whose definitions are empty stubs
and never even declared in nn.h (src/nn.cpp:455-461; SURVEY.md §2.11) — we
implement the intended capability. The lookup is a gather, whose backward is
a scatter-add; XLA lowers both natively, and under ``pjit`` a model-sharded
table turns the gather into an all-to-all automatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gnn_tpu.nn import init as init_lib
from gnn_tpu.nn.module import Module, static_field

__all__ = ["Embedding"]


class Embedding(Module):
    weight: jax.Array  # [num_embeddings, features]
    num_embeddings: int = static_field(default=0)
    features: int = static_field(default=0)

    def __init__(self, num_embeddings: int, features: int, *, key, dtype=jnp.float32):
        self.num_embeddings = num_embeddings
        self.features = features
        self.weight = init_lib.normal(key, (num_embeddings, features), dtype)

    def __call__(self, idx: jax.Array) -> jax.Array:
        return jnp.take(self.weight, idx, axis=0)
