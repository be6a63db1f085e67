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
from pnp_ovss_tpu.models.vit import ViTBlock, ViTBlockFused
from pnp_ovss_tpu.ops import flash_attention as _flash
from pnp_ovss_tpu.ops import vit_block_pallas as _vbp
from pnp_ovss_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _embed(cfg: ViTConfig, p, images: jax.Array) -> jax.Array:
    """The ViT stem, functionally: patch conv + CLS + pos embeddings.

    Mirrors models/vit.py:313-335 exactly (same module params, same dtype
    discipline); the full-encode parity tests pin the equivalence.
    """
    dtype = jnp.dtype(cfg.dtype)
    b = images.shape[0]
    x = nn.Conv(
        cfg.hidden_size,
        kernel_size=(cfg.patch_size, cfg.patch_size),
        strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dtype=dtype,
        name="patch_embed",
    ).apply({"params": p["patch_embed"]}, images.astype(dtype))
    x = x.reshape(b, cfg.num_patches, cfg.hidden_size)
    x = jnp.concatenate(
        [jnp.broadcast_to(p["cls_token"].astype(dtype),
                          (b, 1, cfg.hidden_size)), x],
        axis=1,
    )
    return x + p["pos_embed"].astype(dtype)


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

    import os

    dtype = jnp.dtype(cfg.dtype)
    use_fused = (
        impl == "pallas"
        and os.environ.get("PNP_VIT_FUSED", "1") not in ("0", "false")
        and _flash.flat_supported(cfg.seq_len, cfg.num_heads, cfg.head_dim)
        and _vbp.supported(cfg.hidden_size, 3 * cfg.hidden_size,
                           mlp_hidden=int(cfg.hidden_size * cfg.mlp_ratio))
    )

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
            s_pad = -(-cfg.seq_len // _flash._FLAT_BLOCK_K) \
                * _flash._FLAT_BLOCK_K
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
        # the output sharding matches a data-parallel encode. One
        # activation-sized all_gather; acceptable for an encode that is
        # consumed replicated (the CLI's maps path), and free when pp=1.
        out = jax.lax.all_gather(out, pp_axis)[pp - 1]
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
