"""Test configuration: run everything on a fake 8-device CPU mesh.

Per SURVEY.md §4: multi-chip code paths (shard_map over a Mesh) are tested
without a pod by forcing the CPU platform with 8 virtual devices; the same
code runs unchanged on real TPU slices.

Note: this image's axon TPU plugin forces ``jax_platforms=axon,cpu``
regardless of the JAX_PLATFORMS env var, so we must override via
``jax.config.update`` (env var alone is ignored). XLA_FLAGS must be set
before the first CPU backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
