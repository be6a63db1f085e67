"""Golden-file regression test: the tiny pipeline's outputs are pinned.

Catches unintended numeric drift across refactors (the golden file was
captured from a verified state of the full pipeline; regenerate it
deliberately — see the generator snippet in git history — whenever a
semantic change is INTENDED and note why in the commit).
"""

import dataclasses
import os

import jax
import numpy as np

from pnp_ovss_tpu.config import CRFConfig, PipelineConfig, PostprocessConfig
from pnp_ovss_tpu.models.blip_itm import init_params
from pnp_ovss_tpu.pipeline.runner import SegmentationRunner
from pnp_ovss_tpu.text.captions import build_caption_batch
from pnp_ovss_tpu.text.wordpiece import WordPieceTokenizer

NMS = ["dog", "cat", "grass", "sky"]
GOLDEN = os.path.join(os.path.dirname(__file__), "golden_tiny_pipeline.npz")


def test_tiny_pipeline_matches_golden():
    cfg = PipelineConfig.tiny()
    cfg = dataclasses.replace(
        cfg,
        attribution=dataclasses.replace(cfg.attribution, layer=1, head=1),
        postprocess=PostprocessConfig(
            mode="blur+crf", crf=CRFConfig(num_iters=2),
            bilateral_subsample=1,
        ),
        batch_size=4,
    )
    params = init_params(jax.random.PRNGKey(0), cfg.model,
                         capture_layers=(0,))
    tok = WordPieceTokenizer.toy(["a", "picture", "of"] + NMS)
    rng = np.random.RandomState(42)
    images = rng.rand(4, cfg.img_size, cfg.img_size, 3).astype(np.float32)
    cap = build_caption_batch(
        [["dog", "grass"], ["cat"], ["sky", "dog"], ["grass"]], tok,
        max_text_len=cfg.model.max_text_len, max_classes=cfg.max_classes,
    )
    rgb = rng.randint(0, 255, (4, 32, 32, 3)).astype(np.float32)
    runner = SegmentationRunner(cfg, params, attn_impl="xla",
                                bucket_size=32, bilateral_impl="reference")
    res = runner.run_batch(images, cap, rgb, return_maps=True)

    want = np.load(GOLDEN)
    # Continuous map sums: tight (catches formula/scale drift).
    np.testing.assert_allclose(
        np.asarray(res.maps_agg).sum(axis=(2, 3)),
        want["maps_agg_sum"], rtol=1e-3, atol=1e-5,
    )
    # Discrete labels: identical up to rare float tie-flips.
    assert (res.labels_r0 == want["labels_r0"]).mean() > 0.995
    assert (res.labels_agg == want["labels_agg"]).mean() > 0.995
