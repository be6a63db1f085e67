"""Visualization smoke tests."""

import numpy as np

from pnp_ovss_tpu.utils.viz import (
    attention_overlay, dump_debug_artifacts, label_colormap,
    render_segmentation,
)


def test_attention_overlay_range():
    rng = np.random.RandomState(0)
    img = rng.rand(32, 48, 3).astype(np.float32)
    att = rng.rand(4, 6).astype(np.float32)
    out = attention_overlay(img, att, blur_sigma=1.0)
    assert out.shape == (32, 48, 3)
    assert 0 <= out.min() and out.max() <= 1


def test_render_segmentation_background_untouched():
    rng = np.random.RandomState(1)
    img = rng.rand(16, 16, 3).astype(np.float32)
    labels = np.zeros((16, 16), np.int32)
    labels[4:8, 4:8] = 5
    out = render_segmentation(labels, img)
    np.testing.assert_array_equal(out[0, 0], img[0, 0])  # bg unchanged
    assert not np.allclose(out[5, 5], img[5, 5])  # fg blended


def test_dump_debug_artifacts(tmp_path):
    rng = np.random.RandomState(2)
    dump_debug_artifacts(
        str(tmp_path), "imgX",
        rng.rand(20, 20, 3).astype(np.float32),
        rng.rand(2, 5, 5).astype(np.float32),
        ["dog", "cat"],
        rng.randint(0, 3, (20, 20)),
        gt_labels=rng.randint(0, 3, (20, 20)),
    )
    files = sorted(p.name for p in (tmp_path / "viz").iterdir())
    assert files == [
        "attn_imgX_cat.jpeg", "attn_imgX_dog.jpeg",
        "gt_imgX.jpeg", "seg_imgX.jpeg",
    ]


def test_label_colormap_background_black():
    cmap = label_colormap(10)
    np.testing.assert_array_equal(cmap[0], 0.0)
    assert cmap.shape == (10, 3)
