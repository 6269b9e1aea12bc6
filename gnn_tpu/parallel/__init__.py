"""gnn_tpu.parallel — meshes, sharding, and distributed message passing.

Everything here is net-new capability relative to the reference, which has
no parallelism at all (SURVEY.md §2 parallelism inventory).
"""

from gnn_tpu.parallel.mesh import make_mesh, replicated, shard, P, Mesh, NamedSharding
from gnn_tpu.parallel.partition import DistGraph, partition_graph
from gnn_tpu.parallel.halo import (
    edge_reduce_by_dst,
    edge_valid_mask,
    gather_dst_dist,
    gather_src_dist,
    shard_node_array,
    spmm_dist,
    spmm_dist_dynw,
)
from gnn_tpu.parallel import multihost

__all__ = [
    "make_mesh",
    "replicated",
    "shard",
    "P",
    "Mesh",
    "NamedSharding",
    "DistGraph",
    "partition_graph",
    "spmm_dist",
    "spmm_dist_dynw",
    "gather_src_dist",
    "gather_dst_dist",
    "edge_reduce_by_dst",
    "edge_valid_mask",
    "shard_node_array",
    "multihost",
]
