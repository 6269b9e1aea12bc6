"""Parameter initializers.

The reference initializes Linear weights Kaiming-uniform in ±1/sqrt(fan_in)
(reference: src/nn.cpp:198-204). We reproduce that default and add the usual
suspects. All initializers are ``fn(key, shape, dtype) -> array``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = [
    "kaiming_uniform",
    "glorot_uniform",
    "uniform",
    "normal",
    "zeros",
    "ones",
]


def kaiming_uniform(key, shape, dtype=jnp.float32, fan_in: int | None = None):
    """U(-1/sqrt(fan_in), +1/sqrt(fan_in)) — the reference Linear init
    (src/nn.cpp:198-204, weight shape [out, in] with fan_in = in)."""
    if fan_in is None:
        fan_in = shape[-1] if len(shape) >= 2 else shape[0]
    bound = 1.0 / math.sqrt(max(fan_in, 1))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def glorot_uniform(key, shape, dtype=jnp.float32):
    fan_in = shape[-2] if len(shape) >= 2 else shape[0]
    fan_out = shape[-1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def uniform(key, shape, dtype=jnp.float32, minval=0.0, maxval=1.0):
    return jax.random.uniform(key, shape, dtype, minval=minval, maxval=maxval)


def normal(key, shape, dtype=jnp.float32, stddev=1.0):
    return stddev * jax.random.normal(key, shape, dtype)


def zeros(key, shape, dtype=jnp.float32):
    del key
    return jnp.zeros(shape, dtype)


def ones(key, shape, dtype=jnp.float32):
    del key
    return jnp.ones(shape, dtype)
