"""gnn_tpu.nn — modules, layers, losses.

TPU-native equivalent of the reference's nn layer (include/nn.h,
src/nn.cpp). See individual modules for file:line parity citations.
"""

from gnn_tpu.nn.module import (
    Module,
    static_field,
    field,
    partition,
    combine,
    named_parameters,
    parameter_count,
    state_dict,
    load_state_dict,
    inference_mode,
    map_modules,
    tree_at,
)
from gnn_tpu.nn.state import State, StateIndex, init_state, make_with_state
from gnn_tpu.nn import init
from gnn_tpu.nn.linear import Linear, Identity
from gnn_tpu.nn.embedding import Embedding
from gnn_tpu.nn.activations import (
    relu,
    leaky_relu,
    gelu,
    elu,
    sigmoid,
    tanh,
    softmax,
    log_softmax,
    ReLU,
    LeakyReLU,
    GELU,
    ELU,
    Sigmoid,
    Tanh,
    Softmax,
    LogSoftmax,
)
from gnn_tpu.nn.dropout import Dropout, dropout
from gnn_tpu.nn.normalization import LayerNorm, BatchNorm
from gnn_tpu.nn.containers import Sequential, MLP, call_layer
from gnn_tpu.nn.losses import (
    cross_entropy,
    nll_loss,
    binary_cross_entropy_with_logits,
    mse_loss,
    l1_loss,
    accuracy,
)

__all__ = [
    "Module",
    "static_field",
    "field",
    "partition",
    "combine",
    "named_parameters",
    "parameter_count",
    "state_dict",
    "load_state_dict",
    "inference_mode",
    "map_modules",
    "tree_at",
    "State",
    "StateIndex",
    "init_state",
    "make_with_state",
    "init",
    "Linear",
    "Identity",
    "Embedding",
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
    "Dropout",
    "dropout",
    "LayerNorm",
    "BatchNorm",
    "Sequential",
    "MLP",
    "call_layer",
    "cross_entropy",
    "nll_loss",
    "binary_cross_entropy_with_logits",
    "mse_loss",
    "l1_loss",
    "accuracy",
]
