"""Worker for the 2-process multi-host smoke test (test_parallel.py).

Run as: python multihost_worker.py <process_id> <coordinator_addr>

Each process brings 2 virtual CPU devices (4 global); the worker
initializes the multi-host runtime through gnn_tpu.parallel.multihost,
builds a mesh SPANNING BOTH PROCESSES, runs one spmm_dist step over it,
and checks its addressable output shards against the dense oracle —
the DCN-path execution VERDICT r4 flagged as never exercised.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
)

pid, coord = int(sys.argv[1]), sys.argv[2]

import jax  # noqa: E402

# this image's axon TPU plugin ignores JAX_PLATFORMS (see tests/conftest.py)
jax.config.update("jax_platforms", "cpu")

from gnn_tpu.parallel import multihost  # noqa: E402

multihost.initialize(
    coordinator_address=coord, num_processes=2, process_id=pid
)

import numpy as np  # noqa: E402

from gnn_tpu import graphs  # noqa: E402
from gnn_tpu.parallel import (  # noqa: E402
    make_mesh,
    partition_graph,
    shard_node_array,
    spmm_dist,
)

assert multihost.is_multihost(), "process_count == 1 after initialize"
assert multihost.process_count() == 2
assert len(jax.devices()) == 4, jax.devices()
assert len(multihost.local_devices()) == 2

N, E, F, P = 96, 400, 8, 4
rng = np.random.default_rng(0)  # same stream on both processes
ei = np.stack([rng.integers(0, N, E), rng.integers(0, N, E)])
ei, _ = graphs.to_undirected(ei, num_nodes=N)
ei, w = graphs.gcn_norm(ei, num_nodes=N, self_loops=True)
x = rng.normal(size=(N, F)).astype(np.float32)

mesh = make_mesh((P,), ("data",))
dist = partition_graph(
    ei, np.asarray(w), num_nodes=N, mesh=mesh, halo="alltoall"
)
x_sh = shard_node_array(dist, x, mesh)
out = spmm_dist(dist, x_sh, mesh)

# dense oracle, recomputed identically on each process
A = np.zeros((N, N), np.float32)
np.add.at(A, (np.asarray(ei[1]), np.asarray(ei[0])), np.asarray(w))
want = A @ x

n_max = dist.n_max
ok = 0
for shard in out.addressable_shards:
    lo = shard.index[0].start or 0
    got = np.asarray(shard.data).reshape(-1, F)
    rows = min(n_max, N - lo) if lo < N else 0
    np.testing.assert_allclose(got[:rows], want[lo : lo + rows], atol=1e-4)
    ok += 1
assert ok == 2, f"expected 2 addressable shards, saw {ok}"
print(f"MULTIHOST_OK pid={pid} shards={ok}")
