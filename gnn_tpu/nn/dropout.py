"""Inverted dropout.

Equivalent of the reference's ``nn::Dropout`` (src/nn.cpp:239-268):
Bernoulli(1-p) mask scaled by 1/(1-p), applied only in training mode. Here
the mask comes from a functional PRNG key (no global RNG state), which is
also what makes the op reproducible under ``jax.jit`` and shardable under
``pjit`` (each device derives its mask from the same key + its data slice).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gnn_tpu.nn.module import Module, static_field

__all__ = ["Dropout", "dropout"]


def dropout(
    key: Optional[jax.Array],
    x: jax.Array,
    rate: float,
    *,
    inference: bool = False,
) -> jax.Array:
    if inference or rate == 0.0:
        return x
    if rate >= 1.0:
        return jnp.zeros_like(x)
    if key is None:
        raise ValueError(
            "dropout requires a PRNG key in training mode (pass key=..., or "
            "switch the model to inference with nn.inference_mode)"
        )
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class Dropout(Module):
    rate: float = static_field(default=0.5)
    inference: bool = static_field(default=False)

    def __call__(self, x, *, key: Optional[jax.Array] = None):
        return dropout(key, x, self.rate, inference=self.inference)
