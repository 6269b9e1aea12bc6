"""gnn_tpu.graphs — graph containers, converters, transforms.

TPU-native replacement for the reference's graph layer (include/graph.h,
src/graph.cpp): graphs are HBM-resident CSR/COO pytrees, never densified on
the compute path.
"""

from gnn_tpu.graphs.adjacency import Adjacency, build_adjacency
from gnn_tpu.graphs.convert import (
    edge_list,
    to_dense_adj,
    dense_to_edge_list,
    edge_list_to_csr,
    csr_to_edge_list,
)
from gnn_tpu.graphs.transforms import (
    add_self_loops,
    add_remaining_self_loops,
    remove_self_loops,
    coalesce,
    to_undirected,
    gcn_norm,
    degree,
)
from gnn_tpu.graphs.blocked import cluster_order
from gnn_tpu.graphs.data import Data, Batch, TRAIN, VAL, TEST

__all__ = [
    "Adjacency",
    "build_adjacency",
    "cluster_order",
    "edge_list",
    "to_dense_adj",
    "dense_to_edge_list",
    "edge_list_to_csr",
    "csr_to_edge_list",
    "add_self_loops",
    "add_remaining_self_loops",
    "remove_self_loops",
    "coalesce",
    "to_undirected",
    "gcn_norm",
    "degree",
    "Data",
    "Batch",
    "TRAIN",
    "VAL",
    "TEST",
]
