"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated without TPU hardware by simulating devices
on CPU (the SyncBN-test pattern from the reference's vendored subrepo,
re-done the JAX way). Must run before jax initialises its backends.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: CI env may pin a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon TPU plugin wins over the JAX_PLATFORMS env var; the config
# update is the reliable way to pin tests to the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

# Full-precision matmuls for numeric oracle comparisons (the default
# precision truncates f32 matmul inputs even on CPU).
jax.config.update("jax_default_matmul_precision", "highest")
