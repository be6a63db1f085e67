"""Sequence-parallel ViT encode over a (data, model) mesh.

The reference has NO long-context strategy: SURVEY §5 records "no ring
attention, no context parallel, no Ulysses, no blockwise attention
anywhere" — its only answer to 768px inputs is materialising the full
[B, 16, 2305, 2305] probability tensor on one GPU (vit.py:104-106).
This module is the TPU-native answer for the regime data parallelism
cannot reach: when the per-chip batch is already 1 (or latency matters
more than throughput), the TOKEN axis of the quadratic ViT encode is
sharded over the mesh's ``model`` axis instead.

Mechanics (models/vit.py ``sp_axis``): the patch embed runs replicated
within each sequence group (it is <1% of the encode), each device keeps a
contiguous ``S/sp`` chunk of tokens, every block's LN/qkv/proj/MLP touch
local rows only, and attention all-gathers K/V across the axis — at
ViT-L/768px a [B, 2560, 2048] bf16 gather per layer riding ICI — so each
query row sees the full sequence. The per-row math (same k-block schedule
in the flash kernel, same contractions) is identical to the unsharded
encode; tests/test_sequence_parallel.py pins exact equality on the
virtual 8-device CPU mesh.

Scope: a library-level capability validated by the multi-chip dryrun.
The CLI batch path keeps plain data parallelism (B >= n_devices there,
which dominates sequence parallelism whenever it is feasible); wiring SP
into the runner is deliberately deferred until real multi-chip hardware
can measure the trade-off.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P

from pnp_ovss_tpu.models.vit import VisionTransformer
from pnp_ovss_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def encode_images_sp(
    cfg,
    params,
    images: jax.Array,
    mesh: Mesh,
    *,
    impl: str = "pallas",
    data_axis: str = DATA_AXIS,
    sp_axis: str = MODEL_AXIS,
):
    """Sequence-parallel ViT encode: [B, H, W, 3] -> [B, seq_len, hidden].

    ``params``: the VisionTransformer variable dict ({"params": ...});
    replicated across the mesh. ``images``: batch-sharded over
    ``data_axis``; the token axis is sharded over ``sp_axis`` internally
    and re-gathered before returning, so the output sharding matches a
    plain data-parallel encode.
    """
    model = VisionTransformer(cfg, impl=impl, sp_axis=sp_axis)

    def fn(p, im):
        return model.apply(p, im)

    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), P(data_axis)),
        out_specs=P(data_axis),
        # The body mixes collectives with pallas calls whose replication
        # the checker cannot infer; correctness is pinned by the exact
        # parity tests instead.
        check_vma=False,
    )(params, images)
