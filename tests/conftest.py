"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated without TPU hardware by simulating devices
on CPU (the SyncBN-test pattern from the reference's vendored subrepo,
re-done the JAX way). Must run before jax initialises its backends.
"""

import os
import sys

# PNP_GOLDEN_TPU=1 keeps the real TPU backend so the on-device golden can
# run (invoke tests/test_golden_tpu.py ALONE with it — everything else in
# the suite expects the 8-device CPU mesh).
_USE_TPU = bool(os.environ.get("PNP_GOLDEN_TPU"))

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"  # force: CI may pin a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if not _USE_TPU and "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon TPU plugin wins over the JAX_PLATFORMS env var; the config
# update is the reliable way to pin tests to the virtual CPU mesh.
if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

# Full-precision matmuls for numeric oracle comparisons (the default
# precision truncates f32 matmul inputs even on CPU). NOT in golden-TPU
# mode: the golden pins PRODUCTION numerics, and flipping the global
# precision would re-run the pipeline as a different program than the
# captured one.
if not _USE_TPU:
    jax.config.update("jax_default_matmul_precision", "highest")
