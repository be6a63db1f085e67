"""Per-stage throughput breakdown on the current backend.

Times the three pipeline stages independently (attribution drop-loop,
device postprocess, host finalisation) plus the overlapped end-to-end
number, to show where the next optimisation dollar goes. Timing is by
materialisation (block_until_ready is a no-op on the axon backend).

  python scripts/profile_stages.py            # TPU
  BENCH_BUCKET=192 python scripts/profile_stages.py
  BENCH_IMG_SIZE=768 BENCH_BATCH=8 python scripts/profile_stages.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pnp_ovss_tpu.config import PipelineConfig
    from pnp_ovss_tpu.models.blip_itm import init_params
    from pnp_ovss_tpu.pipeline.runner import SegmentationRunner
    from pnp_ovss_tpu.text.captions import build_caption_batch
    from pnp_ovss_tpu.text.wordpiece import WordPieceTokenizer

    cfg = PipelineConfig.reference_default()
    img_size = int(os.environ.get("BENCH_IMG_SIZE", cfg.img_size))
    if img_size != cfg.img_size:
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model,
                vit=dataclasses.replace(cfg.model.vit, image_size=img_size),
            ),
        )
    on_tpu = jax.default_backend() not in ("cpu",)
    batch = int(os.environ.get("BENCH_BATCH", cfg.batch_size if on_tpu else 2))
    impl = "pallas" if on_tpu else "xla"

    params = init_params(
        jax.random.PRNGKey(0), cfg.model,
        capture_layers=(cfg.attribution.layer - 1,), attn_impl=impl,
    )
    runner = SegmentationRunner(
        cfg, params, attn_impl=impl,
        bucket_size=int(os.environ.get("BENCH_BUCKET", 224 if on_tpu else 32)),
        bilateral_impl="pallas" if on_tpu else "reference",
    )

    nms = ["dog", "cat", "grass", "sky", "person", "car", "tree", "wall"]
    tok = WordPieceTokenizer.toy(["a", "picture", "of"] + nms)
    rng = np.random.RandomState(0)
    cap = build_caption_batch(
        [[nms[i % 8], nms[(i + 3) % 8], nms[(i + 5) % 8]]
         for i in range(batch)],
        tok, max_text_len=cfg.model.max_text_len,
        max_classes=cfg.max_classes,
    )
    images = rng.randint(
        0, 256, (batch, cfg.img_size, cfg.img_size, 3)
    ).astype(np.uint8)
    rgb = rng.randint(
        0, 255, (batch, runner.bucket, runner.bucket, 3)
    ).astype(np.float32)

    args = (
        runner._normalize(jnp.asarray(images)),
        jnp.asarray(cap.input_ids),
        jnp.asarray(cap.attention_mask),
        jnp.asarray(cap.pool_matrix),
    )
    bg = jnp.asarray(np.ones(batch, bool))
    valid = jnp.asarray(cap.class_valid)
    rgb_j = jnp.asarray(np.asarray(rgb, np.uint8))
    # Representative GT-relative CRF scale (bucket / a typical 500px image).
    xy = jnp.asarray(
        np.full((batch, 2), runner.bucket / 500.0, np.float32)
    )

    def timed(name, fn, iters=3):
        """Times DEVICE work: syncs on scalar sums, NOT full-array
        transfers — np.asarray of the [B, K, Hb, Wb] maps costs ~10 s of
        tunnel bandwidth per call and used to drown the compute in this
        row (the pipeline never materialises those maps; only uint8
        labels cross to the host)."""

        def sync(out):
            return jax.tree.map(
                lambda x: float(jnp.asarray(x).astype(jnp.float32).sum()),
                out,
            )

        out = fn()  # warmup/compile
        sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            sync(fn())
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:<28} {dt * 1e3:8.1f} ms/batch "
              f"{batch / dt:8.1f} img/s")
        return out

    maps = timed("attribution (drop4+finish)", lambda: runner._attribution(*args))
    (m0, ma), _ = maps
    timed("post (blur+CRF, 2 variants)",
          lambda: runner._post(m0, ma, bg, valid, rgb_j, xy))

    labels = runner._post(m0, ma, bg, valid, rgb_j, xy)
    labels_host = np.asarray(labels[:, 1])

    t0 = time.perf_counter()
    for i in range(batch):
        runner.finalize_image(labels_host[i], [1, 2, 3], (375, 500))
    dt = time.perf_counter() - t0
    print(f"{'host finalize (375x500)':<28} {dt * 1e3:8.1f} ms/batch "
          f"{batch / dt:8.1f} img/s")

    def e2e():
        (mm0, mma), _ = runner._attribution(*args)
        return runner._post(mm0, mma, bg, valid, rgb_j, xy)

    timed("e2e sync (no overlap)", e2e)


if __name__ == "__main__":
    main()
