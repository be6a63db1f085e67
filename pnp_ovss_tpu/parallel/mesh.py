"""Device-mesh helpers: SPMD data + tensor parallelism over ICI.

The reference distributes with one process per GPU, NCCL process groups and
a DistributedSampler (ddp_setup, driver :45-54; mp.spawn :1438-1439), and
reduces final metrics through the filesystem (per-image .npy histograms
summed offline). TPU-native replacement: a single-program jit over a
``jax.sharding.Mesh``; the batch axis is sharded across chips, weights are
replicated (or Megatron-sharded on a second ``model`` axis), and the
confusion-matrix reduction happens in-graph (XLA emits the ICI
all-reduce). Multi-host launch only needs ``jax.distributed.initialize()``
before mesh construction.

Tensor parallelism (absent from the reference — SURVEY §2.4 marks it
"optional later: shard heads across chips for >768px images") is expressed
purely through parameter shardings; the model code is untouched and GSPMD
propagates the head sharding through the attention:

- column-parallel (output features on ``model``): BERT q/k/v projections
  (separate Dense modules, so 768 = 12 heads x 64 shards cleanly through
  the [B,T,H,dh] reshape when tp divides 12), BERT ``intermediate``,
  ViT ``mlp_fc1``.
- row-parallel (input features on ``model``, bias replicated — XLA inserts
  the psum): every ``output_dense``, ViT ``attn/proj``, ViT ``mlp_fc2``.
- replicated: embeddings, LayerNorms, heads, and the ViT fused ``qkv``
  kernel. The fused [in, 3*H*dh] output axis has q/k/v as its *major*
  factor, so a flat shard never aligns with heads and GSPMD would insert a
  resharding collective per block; computing the (cheap, bandwidth-bound)
  qkv matmul replicated and letting the head-sharded consumers slice it
  locally is free of communication. The quadratic attention itself — the
  part worth sharding at 2305 tokens / 768px — is head-sharded via
  propagation from ``proj``'s row-parallel kernel.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

# Param-name rules, applied to the '/'-joined path of each leaf. Axes are
# indexed from the END so the same rule covers plain [in, out] kernels and
# nn.scan-stacked [layers, in, out] kernels.
_COLUMN_PARALLEL = ("query", "key", "value", "intermediate", "mlp_fc1")
_ROW_PARALLEL = ("output_dense", "attn/proj", "mlp_fc2")


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=(DATA_AXIS,))


def make_mesh_2d(
    model_parallel: int,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """(data, model) mesh: batch shards over ``data``, weights over ``model``.

    ``model_parallel`` must divide both the device count and the model's
    head counts (ViT 16, BERT 12 -> tp in {1, 2, 4} for the full model).
    The model axis is innermost so tensor-parallel collectives ride
    adjacent-chip ICI links.
    """
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by tp={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names=(DATA_AXIS, MODEL_AXIS))


def _path_matches(parts: Sequence[str], rule: str) -> bool:
    """True iff ``rule`` (one or more '/'-joined COMPONENT names) appears as
    a consecutive run of whole path segments. Segment-wise matching, not
    substring: a future module named e.g. ``key_pool`` must not silently
    inherit ``key``'s column-parallel sharding."""
    rp = rule.split("/")
    return any(
        list(parts[i : i + len(rp)]) == rp
        for i in range(len(parts) - len(rp) + 1)
    )


def _leaf_spec(path: str, shape, tp: int) -> P:
    """PartitionSpec for one parameter leaf under ``tp``-way model sharding."""

    def axis_spec(axis_from_end: int) -> P:
        if shape[len(shape) - axis_from_end] % tp:
            return P()  # indivisible -> replicate
        spec = [None] * len(shape)
        spec[len(shape) - axis_from_end] = MODEL_AXIS
        return P(*spec)

    parts = path.split("/")
    is_kernel = parts[-1] == "kernel"
    is_bias = parts[-1] == "bias"
    if any(_path_matches(parts, k) for k in _COLUMN_PARALLEL) and (
        is_kernel or is_bias
    ):
        return axis_spec(1)
    if any(_path_matches(parts, k) for k in _ROW_PARALLEL) and is_kernel:
        return axis_spec(2)
    return P()


def param_partition_specs(params, model_parallel: int):
    """Pytree of PartitionSpecs (Megatron column/row layout) for ``params``."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    def spec(path, leaf):
        name = "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in path
        )
        if model_parallel <= 1:
            return P()
        return _leaf_spec(name, leaf.shape, model_parallel)
    return jax.tree_util.tree_unflatten(
        flat[1], [spec(p, l) for p, l in flat[0]]
    )


def pipeline_param_specs(params):
    """PartitionSpecs for pipeline parallelism: the ViT block stack's
    leading [num_layers] axis shards over ``model`` (each stage owns a
    contiguous layer slab, parallel/pipeline.py); every other leaf —
    stem, final norm, the whole BERT/heads side — replicates. Matches
    encode_images_pp's in_specs so no resharding happens at the
    shard_map boundary."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = []
    for path, _ in flat:
        names = [getattr(k, "key", getattr(k, "name", str(k)))
                 for k in path]
        vit_blocks = "visual_encoder" in names and "blocks" in names
        specs.append(P(MODEL_AXIS) if vit_blocks else P())
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_params(mesh: Mesh, params, strategy: str = "megatron"):
    """Device-put ``params`` with partition specs over ``mesh``.

    strategy:
      - "megatron": column/row tensor-parallel specs over the ``model``
        axis (the default; on a 1D data-only mesh this replicates,
        matching the reference's DDP semantics — weights identical on
        every rank, driver :1218).
      - "replicated": P() everywhere — sequence parallelism uses the
        ``model`` axis for tokens, not weights.
      - "pipeline": ViT block stack layer-sharded over ``model``
        (pipeline_param_specs), rest replicated.
    """
    if strategy == "megatron":
        tp = dict(zip(mesh.axis_names, mesh.devices.shape)).get(
            MODEL_AXIS, 1)
        specs = param_partition_specs(params, tp)
    elif strategy == "replicated":
        specs = jax.tree.map(lambda _: P(), params)
    elif strategy == "pipeline":
        specs = pipeline_param_specs(params)
    else:
        raise ValueError(f"unknown shard strategy {strategy!r}")
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


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
