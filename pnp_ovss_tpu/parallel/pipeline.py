"""Pipeline-parallel ViT encode: layer axis sharded over the mesh.

The reference's only distribution strategy is DDP (one process per GPU,
`mp.spawn` + NCCL, PnP_OVSS_0514_updated_segmentation.py:45-54,1438-1439;
SURVEY §2.4) — every rank holds the FULL model. This module adds the
TPU-native strategy for the regime data parallelism cannot reach: when
the weight stack does not fit (or should not monopolise) one chip's HBM,
the 24-block ViT stack shards over the mesh's ``model`` axis — each
device holds ``num_layers / pp`` contiguous blocks — and microbatches
flow stage-to-stage over ICI via ``jax.lax.ppermute`` (GPipe schedule:
``M + pp - 1`` steps, bubble fraction ``(pp-1)/(M+pp-1)``).

Design (the scaling-book recipe, not a torch translation):
- The stacked block parameters already carry a leading ``[num_layers]``
  axis (``nn.scan`` layout, models/vit.py) — pipeline sharding is just
  ``PartitionSpec('model')`` on that axis; no parameter surgery.
- Inside ``jax.shard_map`` each stage scans its LOCAL ``[L/pp, ...]``
  slab with the exact per-layer block math of the unsharded encode
  (``ViTBlock`` / ``ViTBlockFused``), so sharded == unsharded up to
  batch-blocking; the fused-kernel path is bit-identical.
- The stem (patch conv + CLS + pos, <1% of encode FLOPs) and the final
  LayerNorm run replicated on every stage — cheaper than a dedicated
  stage and keeps the schedule symmetric.
- Activations move with a single ``ppermute`` per step riding
  adjacent-chip ICI (the ``model`` axis is innermost in ``make_mesh_2d``).

Scope: a library-level capability validated by exact-parity tests on the
virtual 8-device CPU mesh and by the driver's multi-chip dryrun
(``__graft_entry__.dryrun_multichip``). The CLI batch path keeps plain
data parallelism — ViT-L/16 fits a single v5e chip with room to spare,
so pp only wins when dp is exhausted; wiring it into the runner waits
for hardware where that trade-off is measurable.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pnp_ovss_tpu.config import ViTConfig
from pnp_ovss_tpu.models.vit import (
    ViTBlock, ViTBlockFused, fused_path_supported, fused_seq_pad,
    make_patch_conv, stem_from_patches,
)
from pnp_ovss_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _embed(cfg: ViTConfig, p, images: jax.Array) -> jax.Array:
    """The ViT stem, functionally: patch conv + CLS + pos embeddings.

    Built from the same helpers VisionTransformer.__call__ uses
    (models/vit.py make_patch_conv / stem_from_patches), so the sharded
    and unsharded stems cannot diverge; the full-encode parity tests pin
    the equivalence.
    """
    patches = make_patch_conv(cfg).apply(
        {"params": p["patch_embed"]},
        images.astype(jnp.dtype(cfg.dtype)),
    )
    return stem_from_patches(cfg, patches, p["cls_token"], p["pos_embed"])


def _param_specs(params, pp_axis: str):
    """In-specs pytree: block-stack leaves shard their leading [layers]
    axis over ``pp_axis``; everything else (stem, final norm) replicates."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = []
    for path, _ in flat:
        names = [getattr(k, "key", getattr(k, "name", str(k)))
                 for k in path]
        specs.append(P(pp_axis) if "blocks" in names else P())
    return jax.tree_util.tree_unflatten(treedef, specs)


def encode_images_pp(
    cfg: ViTConfig,
    params,
    images: jax.Array,
    mesh: Mesh,
    *,
    impl: str = "pallas",
    num_microbatches: "int | None" = None,
    data_axis: str = DATA_AXIS,
    pp_axis: str = MODEL_AXIS,
) -> jax.Array:
    """Pipeline-parallel ViT encode: [B, H, W, 3] -> [B, seq_len, hidden].

    ``params``: the VisionTransformer variable dict ({"params": ...});
    the stacked block parameters are layer-sharded over ``pp_axis``, the
    rest replicated. ``images``: batch-sharded over ``data_axis``. Output
    sharding matches a plain data-parallel encode (replicated across the
    pipeline axis), so downstream consumers are oblivious to pp.

    ``num_microbatches`` defaults to the pipeline depth (bubble fraction
    (pp-1)/(2*pp-1)); raise it to amortise the bubble when the per-device
    batch allows.
    """
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    if pp_axis not in sizes or data_axis not in sizes:
        raise ValueError(
            f"encode_images_pp needs a mesh with ({data_axis!r}, "
            f"{pp_axis!r}) axes (make_mesh_2d); got {mesh.axis_names}")
    pp = sizes[pp_axis]
    dp = sizes[data_axis]
    if cfg.num_layers % pp:
        raise ValueError(
            f"num_layers={cfg.num_layers} not divisible by pp={pp}")
    b = images.shape[0]
    if b % dp:
        raise ValueError(f"batch {b} not divisible by dp={dp}")
    b_local = b // dp
    m = num_microbatches if num_microbatches is not None else pp
    if b_local % m:
        raise ValueError(
            f"per-device batch {b_local} not divisible by "
            f"num_microbatches={m}")

    dtype = jnp.dtype(cfg.dtype)
    use_fused = fused_path_supported(cfg, impl)

    def run_stage(stack, x):
        """Scan the local layer slab with the unsharded block math."""
        if use_fused:
            block = ViTBlockFused(cfg, cfg.seq_len)
        else:
            block = ViTBlock(cfg, impl=impl)

        def body(carry, p_layer):
            return block.apply({"params": p_layer}, carry), None

        out, _ = jax.lax.scan(body, x, stack)
        return out

    def fn(p, im):
        p = p["params"]
        stage = jax.lax.axis_index(pp_axis)
        x = _embed(cfg, p, im)  # [B_local, S, D], every stage (cheap stem)
        if use_fused:
            # Whole-encode padded layout, mirroring models/vit.py:350-377.
            s_pad = fused_seq_pad(cfg.seq_len)
            x = jnp.pad(x, ((0, 0), (0, s_pad - cfg.seq_len), (0, 0)))
        s = x.shape[1]
        mb = b_local // m
        stack = p["blocks"]["block"]  # local [L/pp, ...] slab

        # GPipe schedule, unrolled (m + pp - 1 steps are static & small):
        # stage 0 injects microbatch t, every stage runs its slab, the
        # last stage records finished microbatches, one ppermute per step
        # moves activations to the next stage over ICI.
        cur = jnp.zeros((mb, s, cfg.hidden_size), x.dtype)
        buf = jnp.zeros((m, mb, s, cfg.hidden_size), x.dtype)
        for t in range(m + pp - 1):
            if t < m:
                inject = jax.lax.dynamic_slice_in_dim(x, t * mb, mb, 0)
                cur = jnp.where(stage == 0, inject, cur)
            cur = run_stage(stack, cur)
            idx = t - (pp - 1)
            if idx >= 0:
                buf = buf.at[idx].set(
                    jnp.where(stage == pp - 1, cur, buf[idx]))
            if t < m + pp - 2:
                cur = jax.lax.ppermute(
                    cur, pp_axis, [(i, (i + 1) % pp) for i in range(pp)])

        out = buf.reshape(m * mb, s, cfg.hidden_size)
        # Replicate the last stage's result across the pipeline axis so
        # the output sharding matches a data-parallel encode. Masked psum
        # = a last-stage broadcast: every non-last stage contributes exact
        # zeros (buf was only ever written where stage == pp-1), so the
        # sum is bit-identical to the last stage's buffer while peak
        # memory stays at 1x activations and ICI moves ~2x the tensor
        # instead of the pp x of an all_gather-then-index.
        out = jax.lax.psum(
            jnp.where(stage == pp - 1, out, jnp.zeros_like(out)), pp_axis)
        out = out[:, :cfg.seq_len]
        out = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
        ).apply({"params": p["norm"]}, out)
        return out.astype(dtype)

    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(_param_specs(params, pp_axis), P(data_axis)),
        out_specs=P(data_axis),
        # The body mixes ppermute/all_gather with pallas calls whose
        # replication the checker cannot infer; correctness is pinned by
        # the exact parity tests (tests/test_pipeline_parallel.py).
        check_vma=False,
    )(params, images)
