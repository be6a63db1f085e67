"""End-to-end pipeline runner tests (tiny config, CPU) incl. mesh parity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnp_ovss_tpu.config import (
    CRFConfig, DropConfig, PipelineConfig, PostprocessConfig,
)
from pnp_ovss_tpu.models.blip_itm import init_params
from pnp_ovss_tpu.parallel import mesh as mesh_mod
from pnp_ovss_tpu.pipeline.runner import SegmentationRunner
from pnp_ovss_tpu.text.captions import build_caption_batch
from pnp_ovss_tpu.text.wordpiece import WordPieceTokenizer

NMS = ["dog", "cat", "grass", "sky"]


@pytest.fixture(scope="module")
def setup():
    cfg = PipelineConfig.tiny()
    cfg = dataclasses.replace(
        cfg,
        attribution=dataclasses.replace(cfg.attribution, layer=1, head=1),
        postprocess=PostprocessConfig(
            mode="blur+crf", crf=CRFConfig(num_iters=2)
        ),
        batch_size=8,
    )
    params = init_params(
        jax.random.PRNGKey(0), cfg.model, capture_layers=(0,)
    )
    tok = WordPieceTokenizer.toy(["a", "picture", "of"] + NMS)
    return cfg, params, tok


def _batch(cfg, tok, b=8):
    rng = np.random.RandomState(0)
    images = rng.rand(b, cfg.img_size, cfg.img_size, 3).astype(np.float32)
    class_lists = [[NMS[i % 3], NMS[(i + 1) % 4]] for i in range(b)]
    cap = build_caption_batch(
        class_lists, tok, max_text_len=cfg.model.max_text_len,
        max_classes=cfg.max_classes,
    )
    rgb = rng.randint(0, 255, (b, 32, 32, 3)).astype(np.float32)
    return images, cap, rgb


def test_runner_end_to_end(setup):
    cfg, params, tok = setup
    runner = SegmentationRunner(
        cfg, params, attn_impl="xla", bucket_size=32,
        bilateral_impl="reference",
    )
    images, cap, rgb = _batch(cfg, tok)
    res = runner.run_batch(images, cap, rgb)
    assert res.labels_r0.shape == (8, 32, 32)
    assert res.labels_agg.shape == (8, 32, 32)
    # Channel indices stay inside [0, K].
    assert res.labels_r0.min() >= 0
    assert res.labels_r0.max() <= cfg.max_classes
    # Finalisation to GT resolution + category remap.
    # Proposed classes dog (id 1) and grass (id 3).
    out = runner.finalize_image(res.labels_agg[0], [1, 3], (40, 52))
    assert out.shape == (40, 52)
    assert set(np.unique(out)) <= {0, 1, 3}


def test_fitted_text_len_equivalence(setup):
    """A fitted text bucket must give the same attribution maps as the
    full reference padding (masked positions are inert): the text-length
    optimisation may not change results, only cost."""
    from pnp_ovss_tpu.text.captions import fitted_text_len

    cfg, params, tok = setup
    runner = SegmentationRunner(
        cfg, params, attn_impl="xla", bucket_size=32,
        bilateral_impl="reference",
    )
    rng = np.random.RandomState(3)
    b = 2
    images = rng.rand(b, cfg.img_size, cfg.img_size, 3).astype(np.float32)
    class_lists = [["dog", "cat"], ["grass"]]
    fit = fitted_text_len(
        class_lists, tok, max_text_len=cfg.model.max_text_len,
        granularity=8,
    )
    assert fit < cfg.model.max_text_len  # the test exercises a real cut

    outs = []
    for t in (fit, cfg.model.max_text_len):
        cap = build_caption_batch(
            class_lists, tok, max_text_len=t, max_classes=cfg.max_classes,
        )
        args = (
            jnp.asarray(images), jnp.asarray(cap.input_ids),
            jnp.asarray(cap.attention_mask), jnp.asarray(cap.pool_matrix),
        )
        (m0, ma), _ = runner._attribution(*args)
        outs.append((np.asarray(m0), np.asarray(ma)))
    for a, bb in zip(*outs):
        np.testing.assert_allclose(a, bb, rtol=1e-4, atol=1e-6)


def test_runner_mesh_parity(setup):
    """Sharded 8-device run must equal the single-device run exactly."""
    cfg, params, tok = setup
    images, cap, rgb = _batch(cfg, tok)

    r_single = SegmentationRunner(
        cfg, params, attn_impl="xla", bucket_size=32,
        bilateral_impl="reference",
    )
    res_single = r_single.run_batch(images, cap, rgb)

    mesh = mesh_mod.make_mesh()
    assert mesh.devices.size == 8
    r_mesh = SegmentationRunner(
        cfg, params, mesh=mesh, attn_impl="xla", bucket_size=32,
        bilateral_impl="reference",
    )
    res_mesh = r_mesh.run_batch(images, cap, rgb)

    # Continuous attribution maps must agree tightly (different matmul
    # partitionings change accumulation order only).
    args = (
        jnp.asarray(images),
        jnp.asarray(cap.input_ids),
        jnp.asarray(cap.attention_mask),
        jnp.asarray(cap.pool_matrix),
    )
    bucket_s, grid_s = r_single._attribution(*args)
    bucket_m, grid_m = r_mesh._attribution(*mesh_mod.shard_batch(mesh, args))
    for a, b in zip(bucket_s + grid_s, bucket_m + grid_m):
        scale = float(jnp.abs(a).max()) + 1e-12
        diff = float(jnp.abs(a - b).max()) / scale
        # Different batch partitionings only re-tile the row dimension of
        # the matmuls; the contraction order per example is unchanged, so
        # agreement is ~1e-6 (measured), not just "close".
        assert diff < 1e-4, diff

    # Discrete labels: measured exactly equal on the 8-device CPU mesh; a
    # tiny allowance (0.1%) covers tie-flips under other XLA versions.
    mism_r0 = (res_single.labels_r0 != res_mesh.labels_r0).mean()
    mism_agg = (res_single.labels_agg != res_mesh.labels_agg).mean()
    assert mism_r0 <= 0.001, mism_r0
    assert mism_agg <= 0.001, mism_agg


def _encode_parallel_parity(setup, kind, model_axis):
    """Runner wired with encode_parallel == unsharded runner: the sharded
    encode (sequence- or pipeline-parallel) feeds the identical BERT/
    gradcam/post stages, so labels must agree like the dp mesh parity."""
    cfg, params, tok = setup
    images, cap, rgb = _batch(cfg, tok)

    r_single = SegmentationRunner(
        cfg, params, attn_impl="xla", bucket_size=32,
        bilateral_impl="reference",
    )
    res_single = r_single.run_batch(images, cap, rgb)

    mesh = mesh_mod.make_mesh_2d(model_axis)
    r_par = SegmentationRunner(
        cfg, params, mesh=mesh, attn_impl="xla", bucket_size=32,
        bilateral_impl="reference", encode_parallel=kind,
    )
    res_par = r_par.run_batch(images, cap, rgb)
    assert (res_single.labels_r0 != res_par.labels_r0).mean() <= 0.001
    assert (res_single.labels_agg != res_par.labels_agg).mean() <= 0.001


def test_runner_sequence_parallel_parity(setup):
    """dp=2 x sp=4: the runner's token-sharded encode path end to end."""
    _encode_parallel_parity(setup, "sp", 4)


def test_runner_pipeline_parallel_parity(setup):
    """dp=4 x pp=2 (tiny ViT has 2 layers): the runner's layer-sharded
    GPipe encode path end to end."""
    _encode_parallel_parity(setup, "pp", 2)


def test_runner_encode_parallel_needs_model_axis(setup):
    cfg, params, _ = setup
    with pytest.raises(ValueError, match="2D"):
        SegmentationRunner(
            cfg, params, mesh=mesh_mod.make_mesh(), attn_impl="xla",
            bucket_size=32, bilateral_impl="reference",
            encode_parallel="sp",
        )
    with pytest.raises(ValueError, match="2D"):
        SegmentationRunner(
            cfg, params, attn_impl="xla", bucket_size=32,
            bilateral_impl="reference", encode_parallel="pp",
        )


def test_uint8_images_match_host_normalised(setup):
    """The production path (uint8 transfer + on-device CLIP normalisation)
    must match host-side preprocess_image + float submission exactly (the
    same f32 ops run either way; PIL's uint8 resize output was being
    normalised on host before)."""
    from pnp_ovss_tpu.data.transforms import CLIP_MEAN, CLIP_STD

    cfg, params, tok = setup
    runner = SegmentationRunner(
        cfg, params, attn_impl="xla", bucket_size=32,
        bilateral_impl="reference",
    )
    rng = np.random.RandomState(1)
    u8 = rng.randint(0, 256, (8, cfg.img_size, cfg.img_size, 3)).astype(
        np.uint8
    )
    host_norm = ((u8.astype(np.float32) / 255.0) - CLIP_MEAN) / CLIP_STD
    images, cap, rgb = _batch(cfg, tok)
    res_u8 = runner.run_batch(u8, cap, rgb)
    res_f = runner.run_batch(host_norm, cap, rgb)
    assert (res_u8.labels_agg != res_f.labels_agg).mean() <= 0.001
    assert (res_u8.labels_r0 != res_f.labels_r0).mean() <= 0.001


def test_background_rule_context_vs_object(setup):
    cfg, params, tok = setup
    from pnp_ovss_tpu.pipeline.masks import context_includes_background

    assert context_includes_background("voc", 10)
    assert context_includes_background("coco_object", 10)
    assert context_includes_background("psc", 2)
    assert not context_includes_background("psc", 3)
    assert not context_includes_background("ade20k", 5)


def test_prefetch_loader_on_fixture(tmp_path):
    """PrefetchLoader yields complete, ordered, correctly-shaped batches."""
    import os
    from PIL import Image
    from pnp_ovss_tpu.data.datasets import ImageRecord
    from pnp_ovss_tpu.data.loader import PrefetchLoader

    rng = np.random.RandomState(0)
    recs = []
    for i in range(5):
        p = tmp_path / f"img{i}.png"
        Image.fromarray(
            (rng.rand(20, 30, 3) * 255).astype(np.uint8)
        ).save(p)
        recs.append(ImageRecord(
            img_id=str(i), gpt_key=str(i), image_path=str(p),
            load_gt=lambda i=i: np.full((20, 30), i, np.float32),
        ))
    loader = PrefetchLoader(
        recs, batch_size=2, img_size=16, bucket=8, num_workers=2,
    )
    batches = list(loader)
    assert len(loader) == 3 and len(batches) == 3
    assert batches[0].images.shape == (2, 16, 16, 3)
    assert batches[0].rgb_bucket.shape == (2, 8, 8, 3)
    assert batches[-1].images.shape == (1, 16, 16, 3)  # trailing partial
    ids = [r.img_id for b in batches for r in b.records]
    assert ids == ["0", "1", "2", "3", "4"]
    assert batches[1].gts[0][0, 0] == 2.0
