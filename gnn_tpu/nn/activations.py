"""Activation layers and functional forms.

Covers the reference's ReLU (src/nn.cpp:229-237), Softmax/LogSoftmax
(src/nn.cpp:270-283, 380-385 — exp(x - logsumexp) trick), Sigmoid and tanh
(src/nn.cpp:355-378; note the reference's sigmoid formula is wrong —
SURVEY.md §2.11 — we implement the correct 1/(1+e^-x)). All are thin wrappers
over jnp/jax.nn so XLA fuses them into neighboring matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gnn_tpu.nn.module import Module, static_field

__all__ = [
    "relu",
    "leaky_relu",
    "gelu",
    "elu",
    "sigmoid",
    "tanh",
    "softmax",
    "log_softmax",
    "ReLU",
    "LeakyReLU",
    "GELU",
    "ELU",
    "Sigmoid",
    "Tanh",
    "Softmax",
    "LogSoftmax",
]

relu = jax.nn.relu
leaky_relu = jax.nn.leaky_relu
gelu = jax.nn.gelu
elu = jax.nn.elu
sigmoid = jax.nn.sigmoid
tanh = jnp.tanh


def softmax(x, axis: int = -1):
    """Numerically stable softmax — same max-shift trick the reference uses
    (src/nn.cpp:270-283)."""
    return jax.nn.softmax(x, axis=axis)


def log_softmax(x, axis: int = -1):
    return jax.nn.log_softmax(x, axis=axis)


class ReLU(Module):
    def __call__(self, x):
        return relu(x)


class LeakyReLU(Module):
    negative_slope: float = static_field(default=0.01)

    def __call__(self, x):
        return leaky_relu(x, self.negative_slope)


class GELU(Module):
    def __call__(self, x):
        return gelu(x)


class ELU(Module):
    def __call__(self, x):
        return elu(x)


class Sigmoid(Module):
    def __call__(self, x):
        return sigmoid(x)


class Tanh(Module):
    def __call__(self, x):
        return tanh(x)


class Softmax(Module):
    axis: int = static_field(default=-1)

    def __call__(self, x):
        return softmax(x, self.axis)


class LogSoftmax(Module):
    axis: int = static_field(default=-1)

    def __call__(self, x):
        return log_softmax(x, self.axis)
