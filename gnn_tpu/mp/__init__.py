"""gnn_tpu.mp — message-passing layers.

TPU-native equivalent of the reference's graph layer
(include/graph.h:110-138, src/graph.cpp:153-212) plus the SAGE/GAT/GIN
families mandated by BASELINE.json.
"""

from gnn_tpu.mp.message_passing import MessagePassing
from gnn_tpu.mp.gcn import GCNConv
from gnn_tpu.mp.sage import SAGEConv
from gnn_tpu.mp.gat import GATConv
from gnn_tpu.mp.gin import GINConv

__all__ = ["MessagePassing", "GCNConv", "SAGEConv", "GATConv", "GINConv"]
