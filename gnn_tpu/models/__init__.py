"""gnn_tpu.models — end-to-end model families.

EncoderGCN mirrors the reference flagship (src/main.cpp:10-30); GCN/SAGE/GAT
cover the BASELINE.json configs.
"""

from gnn_tpu.models.gcn import GCN, EncoderGCN
from gnn_tpu.models.sage import GraphSAGE
from gnn_tpu.models.gat import GAT
from gnn_tpu.models.gin import GIN

__all__ = ["GCN", "EncoderGCN", "GraphSAGE", "GAT", "GIN"]
