"""Capture the on-device realistic-scale regression golden (VERDICT r2 #2).

Runs the FULL-config pipeline (336px ViT-L + BERT-base, drop4, blur + CRF
at bucket 192 / strided s4 — the shipping defaults — random weights,
fixed seeds) ON THE TPU and
commits the resulting labels + map checksums as tests/golden_tpu.npz.
tests/test_golden_tpu.py re-runs the same program each round on the bench
host and compares.

Why this exists: every numerics bug that shipped silently in rounds 1-2
(bf16 truncation feeding the bilateral exponent, the non-PSD Nystrom Gram
matrix) was invisible to the CPU test suite — CPU matmuls are true f32 and
the Mosaic kernels only run in interpret mode there. This golden is the
TPU-side tripwire for that whole class.

Run ONLY to (re)create the fixture after an INTENDED semantic change:
  python scripts/capture_golden_tpu.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "tests", "golden_tpu.npz")
OUT_768 = os.path.join(REPO, "tests", "golden_tpu_768.npz")


def build_inputs(img_size: int = 336, b: int = 4):
    """Deterministic full-scale batch (shared with the test)."""
    import numpy as np

    from pnp_ovss_tpu.config import PipelineConfig

    cfg = PipelineConfig()  # full reference config (336px, drop4, blur+crf)
    if img_size != cfg.img_size:
        # 768px long-sequence leg (VERDICT r4 #3): 2305-token ViT encode
        # through the unified xlen/flat flash schedule — a different
        # Mosaic kernel configuration (block counts, online-softmax k
        # loop) than the 336px/512-pad one, so it needs its own numerics
        # tripwire.
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model,
                vit=dataclasses.replace(
                    cfg.model.vit, image_size=img_size),
            ),
        )
    return _inputs_for(cfg, b)


def _inputs_for(cfg, b):
    import numpy as np

    from pnp_ovss_tpu.text.captions import build_caption_batch
    from pnp_ovss_tpu.text.wordpiece import WordPieceTokenizer

    rng = np.random.RandomState(1234)
    s = cfg.img_size
    # uint8 images: exercises the production on-device normalisation path.
    images = (rng.rand(b, s, s, 3) * 255).astype(np.uint8)
    rgb_bucket = (rng.rand(b, 192, 192, 3) * 255).astype(np.uint8)
    tok = WordPieceTokenizer.toy(
        ["a", "picture", "of", "dog", "cat", "grass", "sky", "car"]
    )
    names = [["dog", "cat"], ["grass"], ["sky", "car", "dog"], ["cat"]]
    cap = build_caption_batch(
        names[:b], tok, max_text_len=cfg.model.max_text_len,
        max_classes=cfg.max_classes,
    )
    gt_sizes = [(375, 500), (500, 375), (333, 500), (480, 360)][:b]
    return cfg, images, cap, rgb_bucket, gt_sizes


def run_pipeline(img_size: int = 336, b: int = 4):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    import numpy as np

    from pnp_ovss_tpu.models.blip_itm import init_params
    from pnp_ovss_tpu.pipeline.runner import SegmentationRunner

    cfg, images, cap, rgb_bucket, gt_sizes = build_inputs(img_size, b)
    params = init_params(
        jax.random.PRNGKey(0), cfg.model,
        capture_layers=(cfg.attribution.layer - 1,),
    )
    runner = SegmentationRunner(
        cfg, params, attn_impl="pallas", bucket_size=192,
        bilateral_impl="pallas",
    )
    res = runner.submit_batch(
        images, cap, rgb_bucket, return_maps=True, return_grid_maps=True,
        gt_sizes=gt_sizes,
    ).result()
    return {
        "labels_r0": np.asarray(res.labels_r0, np.uint8),
        "labels_agg": np.asarray(res.labels_agg, np.uint8),
        # Float checksums per image: attribution-side (grid maps, before
        # the postprocess) and bucket maps — separate an attribution
        # regression from a postprocess one.
        "grid_r0_sum": np.asarray(res.grid_r0, np.float64).sum(axis=(1, 2, 3)),
        "grid_agg_sum": np.asarray(res.grid_agg, np.float64).sum(axis=(1, 2, 3)),
        "maps_agg_sum": np.asarray(res.maps_agg, np.float64).sum(axis=(1, 2, 3)),
    }


def main():
    import jax

    import numpy as np

    backend = jax.default_backend()
    if backend == "cpu":
        print("capture_golden_tpu: refusing to capture on CPU — the whole "
              "point is TPU (MXU/Mosaic) numerics")
        return 1
    # Both legs, serialized: the 336px shipping config and the 768px
    # long-sequence kernel configuration (2305 tokens). Pass a leg name
    # to capture only one: `python scripts/capture_golden_tpu.py 768`.
    legs = sys.argv[1:] or ["336", "768"]
    for leg in legs:
        if leg == "336":
            out, path = run_pipeline(), OUT
        elif leg == "768":
            out, path = run_pipeline(768, b=2), OUT_768
        else:
            print(f"unknown leg {leg!r} (336 or 768)")
            return 1
        np.savez_compressed(path, backend=backend, **out)
        print(f"wrote {path} (backend={backend})")
        for k, v in out.items():
            print(f"  {k}: shape {v.shape}"
                  + (f" sum {v.sum():.6g}" if v.dtype != np.uint8
                     else f" labelset {sorted(np.unique(v).tolist())[:8]}"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
