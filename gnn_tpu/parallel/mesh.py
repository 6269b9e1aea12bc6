"""Device mesh helpers.

The reference has NO distributed capability of any kind (SURVEY.md §2
parallelism table: every strategy "Absent"; the only artifacts are an empty
CUDA stub and an unstarted thrift TODO, tensor.h:17). The TPU-native
equivalent is declarative: build a named Mesh over the slice, annotate
shardings, and let GSPMD/XLA insert the ICI collectives.

Axes used by this framework:
* ``data``  — graph/node/edge partition axis (the GNN analog of sequence/
  context parallelism: nodes are sharded, halo features are exchanged);
* ``model`` — feature/tensor parallel axis (shard hidden dims of weights).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "replicated", "shard", "P", "Mesh", "NamedSharding"]


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axes: Sequence[str] = ("data", "model"),
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh. Defaults: all devices on the ``data`` axis, size-1
    ``model`` axis. ``shape`` overrides the per-axis sizes."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not match {n} devices")
    return Mesh(np.asarray(devices).reshape(shape), tuple(axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
