"""gnn_tpu.parallel — meshes, sharding, and distributed message passing.

Everything here is net-new capability relative to the reference, which has
no parallelism at all (SURVEY.md §2 parallelism inventory).
"""

from gnn_tpu.parallel.mesh import make_mesh, replicated, shard, P, Mesh, NamedSharding

__all__ = ["make_mesh", "replicated", "shard", "P", "Mesh", "NamedSharding"]
