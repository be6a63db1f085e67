"""Host parity-path tests: numpy postprocess helpers + single-resample
semantics of finalize_image_parity (reference driver :348-379, :358-360)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.ndimage

from pnp_ovss_tpu.ops import host_post
from pnp_ovss_tpu.ops.blur import blur_and_minmax
from pnp_ovss_tpu.ops.resize import resize_bilinear_align_corners
from pnp_ovss_tpu.pipeline import masks as masks_mod


def test_resize_np_matches_jax():
    rng = np.random.RandomState(0)
    x = rng.rand(3, 21, 21).astype(np.float32)
    got = host_post.resize_bilinear_np(x, 60, 80)
    want = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), 60, 80))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_resize_np_matches_torch_interpolate():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    x = rng.rand(1, 2, 21, 21).astype(np.float32)
    got = host_post.resize_bilinear_np(x[0], 37, 53)
    want = F.interpolate(
        torch.from_numpy(x), size=(37, 53), mode="bilinear",
        align_corners=True,
    ).numpy()[0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_blur_np_matches_scipy_and_jax():
    rng = np.random.RandomState(2)
    x = rng.rand(2, 40, 50).astype(np.float32)
    sigma = 0.05 * 50
    got = host_post.blur_and_minmax_np(x, sigma)
    # scipy is the reference (driver :1149-1153).
    ref = np.stack([
        scipy.ndimage.gaussian_filter(m, sigma) for m in x
    ])
    ref = host_post.rescale_0_1_np(ref)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
    # and the device formulation agrees too.
    dev = np.asarray(blur_and_minmax(jnp.asarray(x), sigma))
    np.testing.assert_allclose(got, dev, rtol=1e-4, atol=1e-5)


def test_rescale_np_matches_jax():
    rng = np.random.RandomState(3)
    x = rng.rand(4, 8, 8).astype(np.float32) * 5 - 1
    x[2] = 0.7  # constant map -> stays put under both impls
    got = host_post.rescale_0_1_np(x)
    want = np.asarray(masks_mod.rescale_0_1(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.fixture()
def parity_runner():
    from pnp_ovss_tpu.config import PipelineConfig
    from pnp_ovss_tpu.pipeline.runner import SegmentationRunner

    cfg = dataclasses.replace(
        PipelineConfig.tiny(),
        postprocess=dataclasses.replace(
            PipelineConfig.tiny().postprocess, mode=""
        ),
    )
    return SegmentationRunner(
        cfg, params={}, bucket_size=32, bilateral_impl="reference"
    )


def test_finalize_parity_single_resample(parity_runner):
    """Grid maps resize to GT in ONE bilinear step (reference :358-360):
    the output must equal the hand-built grid->GT composition, and differ
    from the old grid->bucket->GT double resample."""
    rng = np.random.RandomState(4)
    g = parity_runner.cfg.model.vit.grid
    kmax = parity_runner.cfg.max_classes
    k, h, w = 2, 45, 61
    maps_grid = np.zeros((kmax, g, g), np.float32)
    maps_grid[:k] = rng.rand(k, g, g) * (rng.rand(k, g, g) > 0.5)
    class_valid = np.arange(kmax) < k
    rgb = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    cat_ids = [5, 9]

    pred = parity_runner.finalize_image_parity(
        maps_grid, True, class_valid, cat_ids, rgb, (h, w), rescale=False
    )
    # Hand-built reference composition (no blur/CRF in this config).
    up = host_post.resize_bilinear_np(maps_grid[:k], h, w)
    bg = (up.max(axis=0) == 0).astype(np.float32)
    want = np.argmax(np.concatenate([bg[None], up]), axis=0)
    want = np.array([0] + cat_ids)[want]
    np.testing.assert_array_equal(pred, want)

    # The double-resample path (grid->32 bucket->GT) gives DIFFERENT map
    # values — the thing VERDICT r2 flagged; pin that they disagree so a
    # regression back to chained resamples cannot pass silently.
    up2 = host_post.resize_bilinear_np(
        host_post.resize_bilinear_np(maps_grid[:k], 32, 32), h, w
    )
    assert np.abs(up2 - up).max() > 1e-3


def test_finalize_parity_rescale_variant(parity_runner):
    """Scale_0_1 applies AFTER the GT resize on the r0 variant (:362):
    per-class maps span [0, 1] exactly at GT resolution."""
    rng = np.random.RandomState(5)
    g = parity_runner.cfg.model.vit.grid
    kmax = parity_runner.cfg.max_classes
    maps_grid = np.zeros((kmax, g, g), np.float32)
    maps_grid[0] = rng.rand(g, g) * 0.3 + 0.1  # max well below 1
    class_valid = np.arange(kmax) < 1
    rgb = (rng.rand(20, 30, 3) * 255).astype(np.uint8)

    up = host_post.resize_bilinear_np(maps_grid[:1], 20, 30)
    want = host_post.rescale_0_1_np(up)
    bg = (want.max(axis=0) == 0).astype(np.float32)
    lab = np.argmax(np.concatenate([bg[None], want]), axis=0)
    pred = parity_runner.finalize_image_parity(
        maps_grid, True, class_valid, [7], rgb, (20, 30), rescale=True
    )
    np.testing.assert_array_equal(pred, np.array([0, 7])[lab])


def test_submit_batch_returns_grid_maps():
    """return_grid_maps delivers the grid-res thresholded maps whose
    one-step GT resize the parity path consumes; bucket maps stay None."""
    from pnp_ovss_tpu.config import PipelineConfig
    from pnp_ovss_tpu.models.blip_itm import init_params
    from pnp_ovss_tpu.pipeline.runner import SegmentationRunner
    from pnp_ovss_tpu.text.captions import build_caption_batch
    from pnp_ovss_tpu.text.wordpiece import WordPieceTokenizer

    import jax

    cfg = PipelineConfig.tiny()
    layer0 = cfg.attribution.layer - 1
    params = init_params(
        jax.random.PRNGKey(0), cfg.model, capture_layers=(layer0,)
    )
    tok = WordPieceTokenizer.toy(["a", "picture", "of", "dog", "cat"])
    runner = SegmentationRunner(
        cfg, params, attn_impl="xla", bucket_size=32,
        bilateral_impl="reference",
    )
    rng = np.random.RandomState(0)
    b, s = 2, cfg.img_size
    images = rng.rand(b, s, s, 3).astype(np.float32)
    cap = build_caption_batch(
        [["dog"], ["cat", "dog"]], tok,
        max_text_len=cfg.model.max_text_len, max_classes=cfg.max_classes,
    )
    rgb = (rng.rand(b, 32, 32, 3) * 255).astype(np.uint8)
    res = runner.submit_batch(
        images, cap, rgb, return_grid_maps=True
    ).result()
    g = cfg.model.vit.grid
    assert res.grid_r0.shape == (b, cfg.max_classes, g, g)
    assert res.grid_agg.shape == (b, cfg.max_classes, g, g)
    assert res.maps_r0 is None and res.maps_agg is None
    # Thresholded raw maps: non-negative, padded class slots all-zero.
    assert res.grid_agg.min() >= 0
    assert np.all(res.grid_agg[0, cap.class_valid[0] == False] == 0)  # noqa: E712
