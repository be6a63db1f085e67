"""Decompose the bert_step cost (slope-timed, TPU).

The 336px stage profile puts bert_step (BERT fwd + tap-vjp GradCAM) at
~28 ms/call x 4 drop rounds — the second-largest attribution cost after
the ViT encode, at a back-of-envelope ~27% bf16 MFU vs the encode's
~60%. Before spending a redesign (e.g. hoisting the 12 layers'
cross-attention K/V projections out of the layer scan into one big
matmul), measure where the time actually goes:

  bert_gradcam   the production fwd+vjp program (gradcam_from_embeds)
  bert_fwd       forward only (same tap-capture graph, no grad)
  text_only      forward with image_embeds=None (no cross-attention)
  kv_one_dot     ALL 12 layers' cross K/V projections as ONE
                 [B*S, 1024] @ [1024, 12*2*768] matmul — the best case
                 a K/V hoist could reach for that work

Derived: vjp cost = gradcam - fwd; cross-attn share = fwd - text_only;
if (cross share) >> (kv_one_dot + attention-score floor), the hoist has
headroom; if not, the axis closes with this measurement.

Timing uses the SLOPE of n back-to-back dispatches with one final
materialisation (per-call sync costs ~0.15-0.2 s over the tunnel and
drowns 30 ms programs — NOTES.md round-3 lesson).

  python scripts/bisect_bert.py                 # TPU, 336px shapes
  BENCH_IMG_SIZE=768 python scripts/bisect_bert.py
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

    from pnp_ovss_tpu.attribution.gradcam import gradcam_from_embeds
    from pnp_ovss_tpu.config import PipelineConfig
    from pnp_ovss_tpu.models.blip_itm import BlipITM, init_params
    from pnp_ovss_tpu.text.captions import build_caption_batch
    from pnp_ovss_tpu.text.wordpiece import WordPieceTokenizer

    # PNP_BISECT_TINY=1: CPU smoke of the script's plumbing (tree walk,
    # shapes, jits) with the tiny config — numbers are meaningless there.
    tiny = os.environ.get("PNP_BISECT_TINY") == "1"
    cfg = PipelineConfig.tiny() if tiny else PipelineConfig.reference_default()
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
    batch = int(os.environ.get(
        "BENCH_BATCH", (35 if img_size < 768 else 12) if on_tpu else 2))
    impl = "pallas" if on_tpu else "xla"
    cap_layer = cfg.attribution.layer - 1

    model = BlipITM(cfg.model, capture_layers=(cap_layer,), attn_impl=impl)
    params = init_params(
        jax.random.PRNGKey(0), cfg.model,
        capture_layers=(cap_layer,), attn_impl=impl,
    )

    nms = ["dog", "cat", "grass", "sky", "person", "car", "tree", "wall"]
    tok = WordPieceTokenizer.toy(["a", "picture", "of"] + nms)
    cap = build_caption_batch(
        [[nms[i % 8], nms[(i + 3) % 8], nms[(i + 5) % 8]]
         for i in range(batch)],
        tok, max_text_len=cfg.model.max_text_len,
        max_classes=cfg.max_classes,
    )
    ids = jnp.asarray(cap.input_ids)
    mask = jnp.asarray(cap.attention_mask)
    t = ids.shape[1]
    s_img = cfg.model.vit.seq_len
    width = cfg.model.vit.hidden_size
    h = cfg.model.bert.num_heads
    grid = cfg.model.vit.grid

    rng = np.random.RandomState(0)
    embeds = jnp.asarray(
        rng.randn(batch, s_img, width).astype(np.float32), jnp.bfloat16
    )

    def apply_embeds(p, e, i, m, cross_tap):
        return model.apply(p, e, i, m, cross_tap=cross_tap,
                           method=model.itm_from_embeds)

    @jax.jit
    def bert_gradcam(p, e, i, m):
        return gradcam_from_embeds(
            apply_embeds, p, e, i, m,
            num_capture_layers=1, num_heads=h, grid=grid,
        )

    @jax.jit
    def bert_fwd(p, e, i, m):
        tap = jnp.zeros((1, batch, h, t, s_img), jnp.float32)
        logits, _ = apply_embeds(p, e, i, m, tap)
        return logits

    @jax.jit
    def text_only(p, i, m):
        # BertFusionEncoder skips the cross-attention sublayer entirely
        # when image_embeds is None (reference med.py mode="text").
        return model.apply(
            p, i, m, method=lambda mod, ii, mm: mod.text_encoder(ii, mm, None)
        )[0]

    # ALL cross K/V projection weights as one [1024, 12*2*768] matrix:
    # the stacked scan group carries [n_pre, 1024, 768] kernels; the
    # unrolled capture/post layers carry [1024, 768] each.
    kv_mats = []

    def collect(tree, path=()):
        if isinstance(tree, dict):
            for k, v in tree.items():
                collect(v, path + (k,))
            return
        if "crossattention" in path and path[-2] in ("key", "value") \
                and path[-1] == "kernel":
            w = np.asarray(tree, np.float32)
            kv_mats.extend(w if w.ndim == 3 else [w])

    collect(jax.tree.map(lambda x: x, params)["params"])
    w_all = jnp.asarray(
        np.concatenate([m.reshape(width, -1) for m in kv_mats], axis=1),
        jnp.bfloat16,
    )
    print(f"kv hoist matrix: [{width}, {w_all.shape[1]}] "
          f"({len(kv_mats)} kernels)")

    @jax.jit
    def kv_one_dot(e, w):
        return e.reshape(-1, width) @ w

    def slope(name, fn, *args,
              n1=int(os.environ.get("BISECT_N1", 4)),
              n2=int(os.environ.get("BISECT_N2", 12))):
        def run(n):
            out = None
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(*args)
            leaf = jax.tree.leaves(out)[0]
            float(jnp.asarray(leaf).astype(jnp.float32).sum())
            return time.perf_counter() - t0
        run(2)  # warmup/compile
        ta = run(n1)
        tb = run(n2)
        ms = (tb - ta) / (n2 - n1) * 1e3
        print(f"{name:<24} {ms:8.2f} ms/call")
        return ms

    print(f"backend={jax.default_backend()} B={batch} T={t} S={s_img} "
          f"capture_layer={cap_layer}")
    g = slope("bert_gradcam (prod)", bert_gradcam, params, embeds, ids, mask)
    f = slope("bert_fwd only", bert_fwd, params, embeds, ids, mask)
    to = slope("text_only fwd", text_only, params, ids, mask)
    kv = slope("kv_one_dot (hoist bound)", kv_one_dot, embeds, w_all)
    print(f"derived: vjp={g - f:.2f} ms, cross-attn share={f - to:.2f} ms, "
          f"kv hoist best case={kv:.2f} ms")


if __name__ == "__main__":
    main()
