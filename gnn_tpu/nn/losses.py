"""Loss functions.

``cross_entropy`` mirrors the reference's ``cross_entropy_loss``
(src/nn.cpp:442-453): differentiable gather of the target logit, softmax
probability, -log, mean. Here that chain is gather + logsumexp fused by XLA;
the backward of the gather is the scatter the reference hand-writes in its
Slice op (operation.h:602-612). All losses take an optional boolean ``mask``
(for the Data train/val/test split masks, reference graph.h:14-19) and reduce
over masked elements only.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "cross_entropy",
    "nll_loss",
    "binary_cross_entropy_with_logits",
    "mse_loss",
    "l1_loss",
    "accuracy",
]


def _masked_mean(values: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    if mask is None:
        return jnp.mean(values)
    mask = mask.astype(values.dtype)
    return jnp.sum(values * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def cross_entropy(
    logits: jax.Array,
    targets: jax.Array,
    mask: Optional[jax.Array] = None,
    *,
    label_smoothing: float = 0.0,
) -> jax.Array:
    """Softmax cross entropy with integer targets. logits [N, C], targets [N]."""
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(log_probs, targets[:, None], axis=-1)[:, 0]
    if label_smoothing > 0.0:
        n_classes = logits.shape[-1]
        smooth = jnp.mean(log_probs, axis=-1)
        picked = (1.0 - label_smoothing) * picked + label_smoothing * smooth
        del n_classes
    return _masked_mean(-picked, mask)


def nll_loss(
    log_probs: jax.Array, targets: jax.Array, mask: Optional[jax.Array] = None
) -> jax.Array:
    picked = jnp.take_along_axis(log_probs, targets[:, None], axis=-1)[:, 0]
    return _masked_mean(-picked, mask)


def binary_cross_entropy_with_logits(
    logits: jax.Array, targets: jax.Array, mask: Optional[jax.Array] = None
) -> jax.Array:
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    # log(1+e^-|x|) formulation for stability
    losses = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    return _masked_mean(losses, mask)


def mse_loss(pred, target, mask: Optional[jax.Array] = None):
    return _masked_mean(jnp.square(pred - target), mask)


def l1_loss(pred, target, mask: Optional[jax.Array] = None):
    return _masked_mean(jnp.abs(pred - target), mask)


def accuracy(
    logits: jax.Array, targets: jax.Array, mask: Optional[jax.Array] = None
) -> jax.Array:
    correct = (jnp.argmax(logits, axis=-1) == targets).astype(jnp.float32)
    return _masked_mean(correct, mask)
