"""gnn_tpu.utils — validation, PRNG, and small helpers."""

from gnn_tpu.utils.checks import (
    check_rank,
    check_dim,
    check_same_shape,
    check_broadcastable,
    check_matmul,
    check_edge_index,
    normalize_dim,
)

__all__ = [
    "check_rank",
    "check_dim",
    "check_same_shape",
    "check_broadcastable",
    "check_matmul",
    "check_edge_index",
    "normalize_dim",
]
