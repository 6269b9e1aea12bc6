"""gnn_tpu.ops — sparse/segment compute kernels.

The TPU-native replacement for the reference's functional kernel layer
(include/functional.h): dense math is plain jnp (XLA fuses it onto MXU/VPU);
what needs bespoke treatment on TPU is the *sparse* path — SpMM, SDDMM,
segment reductions — implemented here with XLA sorted-segment fallbacks and
Pallas fast paths under gnn_tpu.ops.pallas.
"""

from gnn_tpu.ops.segment import (
    segment_sum,
    segment_mean,
    segment_max,
    segment_min,
    segment_softmax,
    segment_normalize,
)
from gnn_tpu.ops.spmm import spmm, spmm_coo, spmm_edge_weighted
from gnn_tpu.ops.sddmm import sddmm, gather_src, gather_dst
from gnn_tpu.ops.pool import (
    global_add_pool,
    global_mean_pool,
    global_max_pool,
)

__all__ = [
    "global_add_pool",
    "global_mean_pool",
    "global_max_pool",
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_min",
    "segment_softmax",
    "segment_normalize",
    "spmm",
    "spmm_coo",
    "spmm_edge_weighted",
    "sddmm",
    "gather_src",
    "gather_dst",
]
