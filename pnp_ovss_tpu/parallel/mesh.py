"""Device-mesh helpers: SPMD data parallelism over ICI.

The reference distributes with one process per GPU, NCCL process groups and
a DistributedSampler (ddp_setup, driver :45-54; mp.spawn :1438-1439), and
reduces final metrics through the filesystem (per-image .npy histograms
summed offline). TPU-native replacement: a single-program jit over a
``jax.sharding.Mesh``; the batch axis is sharded across chips, weights are
replicated, and the confusion-matrix reduction happens in-graph (XLA emits
the ICI all-reduce). Multi-host launch only needs ``jax.distributed
.initialize()`` before mesh construction.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=(DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a pytree of [B, ...] arrays with the batch axis sharded."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return -(-n // m) * m
