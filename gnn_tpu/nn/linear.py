"""Dense layers.

Equivalent of the reference's ``nn::Linear`` (include/nn.h:63-73,
src/nn.cpp:198-211: Kaiming-uniform +-1/sqrt(in) init, forward x @ W^T + b).
On TPU the matmul maps straight onto the MXU; we keep weights in the
[out, in] layout the reference uses but contract with ``dot_general`` so no
transpose is materialized.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gnn_tpu.nn import init as init_lib
from gnn_tpu.nn.module import Module, static_field

__all__ = ["Linear", "Identity"]


class Linear(Module):
    weight: jax.Array  # [out_features, in_features]
    bias: Optional[jax.Array]  # [out_features] or None
    in_features: int = static_field(default=0)
    out_features: int = static_field(default=0)

    def __init__(
        self,
        in_features: int,
        out_features: int,
        *,
        key: jax.Array,
        use_bias: bool = True,
        dtype=jnp.float32,
    ):
        wkey, bkey = jax.random.split(key)
        self.in_features = in_features
        self.out_features = out_features
        self.weight = init_lib.kaiming_uniform(
            wkey, (out_features, in_features), dtype, fan_in=in_features
        )
        self.bias = (
            init_lib.kaiming_uniform(bkey, (out_features,), dtype, fan_in=in_features)
            if use_bias
            else None
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        # x: [..., in] @ W^T: contract x's last dim with weight's last dim.
        y = jax.lax.dot_general(
            x,
            self.weight,
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        if self.bias is not None:
            # cast-to-activation-dtype: bf16 activations with f32 master
            # params must not silently promote the output to f32
            y = y + self.bias.astype(y.dtype)
        return y


class Identity(Module):
    def __call__(self, x, *args, **kwargs):
        return x
