"""Tensor-parallel (Megatron-sharded) model tests on the virtual CPU mesh.

The reference has no tensor parallelism (SURVEY §2.4: the only strategy is
DDP data parallelism, driver :45-54,1438-1439); the `model` mesh axis is a
TPU-native extension for the 768px long-sequence path. These tests pin the
two things that make it trustworthy:

1. the partition-spec rules place every leaf where the Megatron layout
   says (column-parallel q/k/v + fc1/intermediate, row-parallel output
   projections, everything else replicated), and
2. a dp x tp run of the full GradCAM step and of the whole pipeline is
   numerically identical to the unsharded run (GSPMD only re-tiles the
   matmuls; per-example contraction order is unchanged).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pnp_ovss_tpu.attribution.gradcam import gradcam_from_tap
from pnp_ovss_tpu.config import (
    CRFConfig, ModelConfig, PipelineConfig, PostprocessConfig,
)
from pnp_ovss_tpu.models.blip_itm import BlipITM, init_params
from pnp_ovss_tpu.parallel import mesh as mesh_mod
from pnp_ovss_tpu.pipeline.runner import SegmentationRunner
from pnp_ovss_tpu.text.captions import build_caption_batch
from pnp_ovss_tpu.text.wordpiece import WordPieceTokenizer

NMS = ["dog", "cat", "grass", "sky"]


@pytest.fixture(scope="module")
def tiny_model():
    cfg = ModelConfig.tiny()
    params = init_params(
        jax.random.PRNGKey(0), cfg, capture_layers=(1,), attn_impl="xla"
    )
    return cfg, params


def test_partition_spec_rules(tiny_model):
    cfg, params = tiny_model
    specs = mesh_mod.param_partition_specs(params, model_parallel=2)
    p = specs["params"]
    bert = p["text_encoder"]["layer_1"]
    # Column-parallel: output features sharded, bias rides along.
    assert bert["attention"]["query"]["kernel"] == P(None, "model")
    assert bert["attention"]["query"]["bias"] == P("model")
    assert bert["crossattention"]["value"]["kernel"] == P(None, "model")
    assert bert["intermediate"]["kernel"] == P(None, "model")
    # Row-parallel: input features sharded, bias replicated (psum follows).
    assert bert["attention"]["output_dense"]["kernel"] == P("model", None)
    assert bert["attention"]["output_dense"]["bias"] == P()
    assert bert["output_dense"]["kernel"] == P("model", None)
    # Scan-stacked ViT leaves: same rules shifted past the layer axis.
    vit = p["visual_encoder"]["blocks"]["block"]
    assert vit["mlp_fc1"]["kernel"] == P(None, None, "model")
    assert vit["mlp_fc1"]["bias"] == P(None, "model")
    assert vit["mlp_fc2"]["kernel"] == P(None, "model", None)
    assert vit["attn"]["proj"]["kernel"] == P(None, "model", None)
    # Fused qkv stays replicated (flat 3*H axis never aligns with heads).
    assert vit["attn"]["qkv"]["kernel"] == P()
    # Replicated leaves: embeddings, norms, task heads.
    assert p["text_encoder"]["word_embeddings"]["embedding"] == P()
    assert vit["norm1"]["scale"] == P()
    assert p["itm_head"]["kernel"] == P()
    assert p["vision_proj"]["kernel"] == P()
    # Indivisible dims fall back to replication rather than erroring.
    specs5 = mesh_mod.param_partition_specs(params, model_parallel=5)
    b5 = specs5["params"]["text_encoder"]["layer_1"]
    assert b5["attention"]["query"]["kernel"] == P()


def test_partition_spec_segment_matching():
    """Rules match whole path SEGMENTS, not substrings: a module whose
    name merely contains 'key' / 'value' must stay replicated, and
    'attn/proj' must not match a 'proj' outside an 'attn' parent."""
    shape = (8, 8)
    assert mesh_mod._leaf_spec("enc/key/kernel", shape, 2) == P(None, "model")
    assert mesh_mod._leaf_spec("enc/key_pool/kernel", shape, 2) == P()
    assert mesh_mod._leaf_spec("enc/value_head/bias", (8,), 2) == P()
    assert mesh_mod._leaf_spec(
        "blocks/attn/proj/kernel", shape, 2) == P("model", None)
    assert mesh_mod._leaf_spec("blocks/proj/kernel", shape, 2) == P()
    # 'kernel'/'bias' must be the LEAF segment, not an interior module.
    assert mesh_mod._leaf_spec("query/kernel_stats/scale", shape, 2) == P()


def _gradcam_step(cfg, model):
    def apply_fn(p, im, i, m, cross_tap):
        return model.apply(p, im, i, m, cross_tap=cross_tap)

    def step(p, images, ids, mask):
        gc, logits = gradcam_from_tap(
            apply_fn, p, images, ids, mask, num_capture_layers=1,
            num_heads=cfg.bert.num_heads, num_image_tokens=cfg.vit.seq_len,
            grid=cfg.vit.grid,
        )
        return gc[0, :, 1], logits

    return step


@pytest.mark.parametrize("tp", [2, 4])
def test_gradcam_step_tp_parity(tiny_model, tp):
    """dp x tp GradCAM == unsharded GradCAM (forward AND tap-vjp)."""
    cfg, params = tiny_model
    model = BlipITM(cfg, capture_layers=(1,), attn_impl="xla")
    step = _gradcam_step(cfg, model)

    b = 8
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.rand(b, cfg.vit.image_size, cfg.vit.image_size, 3), jnp.float32
    )
    ids = np.zeros((b, cfg.max_text_len), np.int32)
    mask = np.zeros_like(ids)
    ids[:, :8] = rng.randint(3, 100, (b, 8))
    ids[:, 0] = cfg.bert.enc_token_id
    mask[:, :8] = 1
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)

    ref_gc, ref_logits = jax.jit(step)(params, images, ids, mask)

    mesh = mesh_mod.make_mesh_2d(tp)
    sharded = mesh_mod.shard_params(mesh, params)
    # tp=2 divides the tiny head count (2) so the q/k/v shard is
    # head-aligned; tp=4 splits heads in half — GSPMD inserts a reshard at
    # the [B,T,H,dh] reshape but the program stays numerically exact, which
    # is precisely what this parametrisation pins.
    q = sharded["params"]["text_encoder"]["layer_1"]["attention"]["query"][
        "kernel"
    ]
    assert q.sharding.spec == P(None, "model")
    bs = NamedSharding(mesh, P(mesh_mod.DATA_AXIS))
    args = [jax.device_put(x, bs) for x in (images, ids, mask)]
    gc, logits = jax.jit(step)(sharded, *args)

    np.testing.assert_allclose(
        np.asarray(gc), np.asarray(ref_gc), rtol=0, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), rtol=0, atol=1e-5
    )


def test_runner_dp_tp_parity():
    """Full pipeline over a (data=4, model=2) mesh == single-device run."""
    cfg = PipelineConfig.tiny()
    cfg = dataclasses.replace(
        cfg,
        attribution=dataclasses.replace(cfg.attribution, layer=1, head=1),
        postprocess=PostprocessConfig(
            mode="blur+crf", crf=CRFConfig(num_iters=2)
        ),
        batch_size=8,
    )
    params = init_params(jax.random.PRNGKey(0), cfg.model,
                         capture_layers=(0,))
    tok = WordPieceTokenizer.toy(["a", "picture", "of"] + NMS)
    b = 8
    rng = np.random.RandomState(0)
    images = rng.rand(b, cfg.img_size, cfg.img_size, 3).astype(np.float32)
    cap = build_caption_batch(
        [[NMS[i % 3], NMS[(i + 1) % 4]] for i in range(b)], tok,
        max_text_len=cfg.model.max_text_len, max_classes=cfg.max_classes,
    )
    rgb = rng.randint(0, 255, (b, 32, 32, 3)).astype(np.float32)

    r_single = SegmentationRunner(
        cfg, params, attn_impl="xla", bucket_size=32,
        bilateral_impl="reference",
    )
    res_s = r_single.run_batch(images, cap, rgb)

    mesh = mesh_mod.make_mesh_2d(2)
    assert mesh.devices.shape == (4, 2)
    r_tp = SegmentationRunner(
        cfg, params, mesh=mesh, attn_impl="xla", bucket_size=32,
        bilateral_impl="reference",
    )
    res_tp = r_tp.run_batch(images, cap, rgb)

    assert (res_s.labels_r0 != res_tp.labels_r0).mean() <= 0.001
    assert (res_s.labels_agg != res_tp.labels_agg).mean() <= 0.001
