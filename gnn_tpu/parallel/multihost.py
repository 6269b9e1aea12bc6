"""Multi-host runtime setup.

The reference's only gesture at distribution is an unfinished thrift RPC
TODO (reference: include/tensor.h:17; SURVEY.md §5 "Distributed
communication backend: ABSENT"). On TPU pods no hand-written transport is
needed: ``jax.distributed.initialize`` wires the hosts, after which
``jax.devices()`` spans the slice and every mesh/shard_map/collective in
gnn_tpu.parallel works unchanged — ICI within a slice, DCN across slices.

Typical pod usage:

    from gnn_tpu.parallel import multihost, make_mesh, partition_graph
    multihost.initialize()                   # auto-detect on Cloud TPU
    mesh = make_mesh(axes=("data",))         # all chips on all hosts
    dist = partition_graph(ei, w, num_nodes=N, mesh=mesh, halo="alltoall")

For the targeted halo exchange, prefer 'alltoall' across DCN: each chip
ships only its boundary rows instead of the full feature matrix.
"""

from __future__ import annotations

from typing import Optional

import jax

__all__ = ["initialize", "is_multihost", "process_count", "local_devices"]


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host runtime (no-op if already initialized or
    single-process). Arguments are auto-detected on Cloud TPU."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def is_multihost() -> bool:
    return jax.process_count() > 1


def process_count() -> int:
    return jax.process_count()


def local_devices():
    return jax.local_devices()
