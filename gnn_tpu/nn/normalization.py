"""LayerNorm and BatchNorm.

Equivalents of the reference's ``nn::LayerNorm`` (src/nn.cpp:332-353) and
``nn::BatchNorm`` (src/nn.cpp:285-330). Notes vs the reference:

* The reference's BatchNorm running-stat momentum convention is
  ``running*m + new*(1-m)`` (src/nn.cpp:323-324) — reversed relative to
  PyTorch. We keep the PyTorch/PyG convention
  ``running*(1-m) + new*m`` (SURVEY.md §2.11 directs targeting intended/PyG
  semantics, not reference bugs) with the same default momentum 0.1.
* Running stats are buffers, so they live in the :class:`~gnn_tpu.nn.state.State`
  store, not in the trainable pytree.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gnn_tpu.nn.module import Module, static_field
from gnn_tpu.nn.state import State, StateIndex

__all__ = ["LayerNorm", "BatchNorm"]


class LayerNorm(Module):
    weight: Optional[jax.Array]
    bias: Optional[jax.Array]
    num_features: int = static_field(default=0)
    eps: float = static_field(default=1e-5)

    def __init__(
        self,
        num_features: int,
        *,
        eps: float = 1e-5,
        elementwise_affine: bool = True,
        dtype=jnp.float32,
    ):
        self.num_features = num_features
        self.eps = eps
        self.weight = jnp.ones((num_features,), dtype) if elementwise_affine else None
        self.bias = jnp.zeros((num_features,), dtype) if elementwise_affine else None

    def __call__(self, x: jax.Array) -> jax.Array:
        # Normalization statistics in f32 even for bf16 activations (the
        # standard TPU mixed-precision recipe); output follows input dtype.
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        if self.weight is not None:
            y = y * self.weight + self.bias
        return y.astype(x.dtype)


class BatchNorm(Module):
    """BatchNorm over the leading (node/batch) axis.

    Call as ``y, state = bn(x, state)``. In training mode the batch statistics
    normalize and the running stats in ``state`` are updated; in inference the
    running stats normalize (reference train/eval split: src/nn.cpp:301-330).
    """

    weight: Optional[jax.Array]
    bias: Optional[jax.Array]
    stats: StateIndex
    num_features: int = static_field(default=0)
    eps: float = static_field(default=1e-5)
    momentum: float = static_field(default=0.1)
    inference: bool = static_field(default=False)

    def __init__(
        self,
        num_features: int,
        *,
        eps: float = 1e-5,
        momentum: float = 0.1,
        affine: bool = True,
        dtype=jnp.float32,
    ):
        self.num_features = num_features
        self.eps = eps
        self.momentum = momentum
        self.inference = False
        self.weight = jnp.ones((num_features,), dtype) if affine else None
        self.bias = jnp.zeros((num_features,), dtype) if affine else None
        self.stats = StateIndex(
            init=(
                jnp.zeros((num_features,), jnp.float32),  # running mean
                jnp.ones((num_features,), jnp.float32),  # running var
            )
        )

    def __call__(
        self,
        x: jax.Array,
        state: State,
        *,
        mask: Optional[jax.Array] = None,
    ):
        """``mask`` (shape ``x.shape[:-1]``, bool): rows where False are
        excluded from the batch statistics (they are still normalized and
        returned — callers mask downstream). This is what lets BatchNorm
        models train on the padded distributed node layout: padding rows
        carry mask=False so the stats are computed over exactly the real
        nodes, matching the single-chip run bit-for-bit in expectation
        (VERDICT r3 item 4)."""
        running_mean, running_var = state.get(self.stats)
        xf = x.astype(jnp.float32)  # batch stats in f32 (bf16-safe)
        if self.inference:
            mean, var = running_mean, running_var
        elif mask is None:
            reduce_axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=reduce_axes)
            var = jnp.var(xf, axis=reduce_axes)
            m = self.momentum
            n = max(int(jnp.size(x) // self.num_features), 1)
            unbiased = var * (n / max(n - 1, 1))
            new_mean = (1 - m) * running_mean + m * jax.lax.stop_gradient(mean)
            new_var = (1 - m) * running_var + m * jax.lax.stop_gradient(unbiased)
            state = state.set(self.stats, (new_mean, new_var))
        else:
            if mask.shape != x.shape[:-1]:
                raise ValueError(
                    f"BatchNorm mask shape {mask.shape} must equal "
                    f"x.shape[:-1] = {x.shape[:-1]}"
                )
            w = mask.astype(jnp.float32)[..., None]
            reduce_axes = tuple(range(x.ndim - 1))
            cnt = jnp.maximum(jnp.sum(w), 1.0)
            mean = jnp.sum(xf * w, axis=reduce_axes) / cnt
            var = jnp.sum(((xf - mean) ** 2) * w, axis=reduce_axes) / cnt
            m = self.momentum
            unbiased = var * (cnt / jnp.maximum(cnt - 1.0, 1.0))
            new_mean = (1 - m) * running_mean + m * jax.lax.stop_gradient(mean)
            new_var = (1 - m) * running_var + m * jax.lax.stop_gradient(unbiased)
            state = state.set(self.stats, (new_mean, new_var))
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        if self.weight is not None:
            y = y * self.weight + self.bias
        return y.astype(x.dtype), state
