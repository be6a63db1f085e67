"""Hyperparameter search CLI: find the best (layer, head, min_att).

Reference: driver :1333-1412 — 34-iteration random-annealing search over
{layer 1..12, head 0..11, min_att 0.05..0.45} maximising the
CLIP-similarity positive-vs-negative reward (optionally scaled by token
contrast). TPU-native differences:

- the 12x12 GradCAM ensemble for all layers/heads is captured in ONE
  forward+backward per image (capture_layers=(0..11)) instead of the
  reference's cached per-config .npy sweep,
- the reward model is the same independent CLIP ViT-L-14-336 the reference
  loads (:1370-1372), as a Flax tower (models/clip.py) + from-scratch BPE
  tokenizer (text/bpe.py); pass --clip_checkpoint/--clip_bpe for real
  weights. --scorer itc instead scores with the BLIP ITC head — a
  no-extra-checkpoint fallback (self-referential reward).
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, List

import numpy as np


def ensemble_gradcam_fn(model, params, cfg):
    """Jitted all-layer GradCAM: images, ids, mask -> [12, B, 12, T-1, g, g]."""
    import jax

    from pnp_ovss_tpu.attribution.gradcam import gradcam_from_tap

    def apply_fn(p, im, i, m, cross_tap):
        return model.apply(p, im, i, m, cross_tap=cross_tap)

    @jax.jit
    def _fn(p, images, ids, mask):
        gc, logits = gradcam_from_tap(
            apply_fn, p, images, ids, mask,
            num_capture_layers=cfg.bert.num_layers,
            num_heads=cfg.bert.num_heads,
            num_image_tokens=cfg.vit.seq_len,
            grid=cfg.vit.grid,
        )
        return gc, logits

    def fn(images, ids, mask):
        # params as jit argument (constant-folding the weights explodes
        # compile time).
        return _fn(params, images, ids, mask)

    return fn


def make_itc_scorer(model, params, *, batch: int = 16):
    """CLIP-style scorer from the BLIP ITC head (reference :156-175)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _itc(p, images, ids, mask):
        from pnp_ovss_tpu.models.blip_itm import BlipITM

        return model.apply(p, images, ids, mask, method=BlipITM.itc)

    def itc(images, ids, mask):
        return _itc(params, images, ids, mask)

    def scorer(images: np.ndarray, texts: List[str], tokenizer,
               max_text_len: int) -> np.ndarray:
        ids, masks = [], []
        for t in texts:
            i, m, _ = tokenizer.encode(t, max_length=max_text_len)
            ids.append(i)
            masks.append(m)
        sims = itc(
            jnp.asarray(images, jnp.float32),
            jnp.asarray(np.stack(ids)),
            jnp.asarray(np.stack(masks)),
        )
        sims = np.asarray(sims) / 0.01  # temperature (reference :170)
        e = np.exp(sims - sims.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    return scorer


def make_clip_scorer(clip_model, clip_params, bpe_tok, *,
                     image_size: int = 336, context_length: int = 77):
    """Independent CLIP reward scorer (reference :1370-1372, :156-175).

    (images [N, H, W, 3] CLIP-normalised, texts) -> probs [N, len(texts)]:
    softmax over classes of (img_embed @ text_embed.T) / 0.01.
    """
    import jax
    import jax.numpy as jnp

    from pnp_ovss_tpu.ops.resize import resize_bilinear_align_corners

    @jax.jit
    def _embed(p, images, ids):
        from pnp_ovss_tpu.models.clip import CLIPModel

        img_z = clip_model.apply(p, images, method=CLIPModel.encode_image)
        txt_z = clip_model.apply(p, ids, method=CLIPModel.encode_text)
        return img_z, txt_z

    def scorer(images: np.ndarray, texts: List[str]) -> np.ndarray:
        if images.shape[1] != image_size:
            images = np.asarray(jax.vmap(
                lambda im: resize_bilinear_align_corners(
                    jnp.transpose(im, (2, 0, 1)), image_size, image_size
                )
            )(jnp.asarray(images))).transpose(0, 2, 3, 1)
        ids = bpe_tok.encode_batch(texts, context_length)
        img_z, txt_z = _embed(
            clip_params, jnp.asarray(images, jnp.float32), jnp.asarray(ids)
        )
        sims = np.asarray(img_z) @ np.asarray(txt_z).T / 0.01  # temp :170
        e = np.exp(sims - sims.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    return scorer


def run_search(
    score_fn,
    *,
    layers=range(1, 13),
    heads=range(0, 12),
    min_atts=None,
    n_iter: int = 34,
    seed: int = 1164005944,
):
    from pnp_ovss_tpu.search.optimizer import (
        RandomAnnealingOptimizer, SearchSpace,
    )

    if min_atts is None:
        min_atts = [round(x, 2) for x in np.arange(0.05, 0.46, 0.05)]
    space = SearchSpace({
        "layer": list(layers),
        "head": list(heads),
        "min_att": list(min_atts),
    })
    opt = RandomAnnealingOptimizer(space, seed=seed)
    best, score = opt.search(score_fn, n_iter=n_iter)
    return best, score, opt.history


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_type", required=True)
    p.add_argument("--home_dir", required=True)
    p.add_argument("--save_path", required=True)
    p.add_argument("--layer", default="1-12", help="layer range a-b")
    p.add_argument("--search", default="Wsupervised",
                   choices=["Wsupervised", "Unsupervised"])
    p.add_argument("--n_iter", type=int, default=34)
    p.add_argument("--limit", type=int, default=100,
                   help="images used for the reward")
    p.add_argument("--img_size", type=int, default=336)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--vocab", default=None)
    # Independent reward model (reference loads CLIP ViT-L-14-336,
    # :1370-1372). "itc" scores with the BLIP ITC head instead — a
    # no-extra-checkpoint fallback, but self-referential (the model then
    # scores its own attention maps).
    p.add_argument("--scorer", default="clip", choices=["clip", "itc"])
    p.add_argument("--clip_checkpoint", default=None,
                   help="OpenAI CLIP ViT-L/14-336px .pt for --scorer clip")
    p.add_argument("--clip_bpe", default=None,
                   help="CLIP bpe_simple_vocab_16e6.txt.gz path")
    p.add_argument("--tiny", action="store_true",
                   help="tiny random model (machinery smoke / e2e tests)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from pnp_ovss_tpu.config import ModelConfig, ViTConfig
    from pnp_ovss_tpu.data import transforms
    from pnp_ovss_tpu.data.categories import get_dataset_meta
    from pnp_ovss_tpu.data.datasets import make_dataset
    from pnp_ovss_tpu.models.blip_itm import BlipITM, init_params
    from pnp_ovss_tpu.ops.segment_pool import pool_token_maps
    from pnp_ovss_tpu.search.reward import RewardEvaluator
    from pnp_ovss_tpu.text.captions import build_caption_batch
    from pnp_ovss_tpu.text.wordpiece import WordPieceTokenizer
    from pnp_ovss_tpu.utils.logging import log

    cfg = (ModelConfig.tiny() if args.tiny
           else ModelConfig(vit=ViTConfig(image_size=args.img_size)))
    meta = get_dataset_meta(args.data_type)
    lo, hi = (int(x) for x in args.layer.split("-"))
    capture = tuple(range(lo - 1, hi))

    model = BlipITM(cfg, capture_layers=capture)
    if args.checkpoint:
        from pnp_ovss_tpu.models.convert import load_torch_checkpoint

        params = load_torch_checkpoint(args.checkpoint, cfg,
                                       capture_layers=capture)
    else:
        log("WARNING: random weights (machinery smoke run)")
        params = init_params(jax.random.PRNGKey(0), cfg,
                             capture_layers=capture)
    if args.vocab:
        tok = WordPieceTokenizer.from_vocab_file(args.vocab)
    else:
        tok = WordPieceTokenizer.toy(["a", "picture", "of"] + meta.nms)

    gc_fn = ensemble_gradcam_fn(model, params, cfg)

    # Precompute per-image ensemble gradcams for the reward subset, pooled
    # per class. Wsupervised uses ground-truth classes (Dataset.py:231);
    # Unsupervised prefers GPT-proposed classes when the cache exists.
    gpt_provider = None
    if args.search == "Unsupervised":
        gpt_path = os.path.join(
            args.home_dir, "GPT4o_classification",
            f"{args.data_type}_classification_noboundary.json",
        )
        if os.path.exists(gpt_path):
            from pnp_ovss_tpu.text.labels import GPTLabelProvider

            gpt_provider = GPTLabelProvider(gpt_path, meta.nms)

    ds = make_dataset(args.data_type, args.home_dir)
    records = list(ds.records())[: args.limit]
    cache: Dict[str, tuple] = {}
    for rec in records:
        raw = transforms.load_rgb(rec.image_path)
        if gpt_provider is not None:
            _, names = gpt_provider.lookup(rec.gpt_key)
        else:
            gt = rec.load_gt()
            gt_ids = [
                int(i) for i in np.unique(gt) if 0 < i < len(meta.nms) + 1
            ]
            names = [meta.nms[i - 1] for i in gt_ids]
        if not names:
            continue
        from pnp_ovss_tpu.text.captions import fitted_text_len

        cap = build_caption_batch(
            [names], tok,
            # Fitted 64-bucket (identical maps, fraction of the BERT
            # fwd+bwd cost — see cli/segment.py).
            max_text_len=fitted_text_len(
                [names], tok, max_text_len=cfg.max_text_len
            ),
            max_classes=28,
        )
        img = transforms.preprocess_image(raw, cfg.vit.image_size)
        gc, _ = gc_fn(
            jnp.asarray(img[None]), jnp.asarray(cap.input_ids),
            jnp.asarray(cap.attention_mask),
        )  # [L, 1, H, T-1, g, g]
        k = int(cap.num_classes[0])
        pooled = np.stack([
            np.asarray(pool_token_maps(
                jnp.asarray(cap.pool_matrix), gc[l, :, h]
            ))[0, :k]
            for l in range(gc.shape[0]) for h in range(gc.shape[2])
        ])  # [(L*H), K, g, g]
        # Masked crops are scored by the BLIP ITC head at the model's own
        # resolution (the reference's separate CLIP runs at 224/336).
        clip_img = transforms.preprocess_image(raw, cfg.vit.image_size)
        cache[rec.img_id] = (pooled.reshape(
            gc.shape[0], gc.shape[2], k, cfg.vit.grid, cfg.vit.grid
        ), cap.class_names[0], clip_img)

    if args.scorer == "clip":
        from pnp_ovss_tpu.config import CLIPConfig
        from pnp_ovss_tpu.models.clip import CLIPModel, init_clip_params
        from pnp_ovss_tpu.text.bpe import CLIPBPETokenizer

        if args.clip_checkpoint:
            clip_cfg = CLIPConfig()
            from pnp_ovss_tpu.models.convert import load_clip_checkpoint

            clip_params = load_clip_checkpoint(args.clip_checkpoint, clip_cfg)
        else:
            log("WARNING: --scorer clip without --clip_checkpoint; tiny "
                "random CLIP (machinery smoke run only)")
            clip_cfg = CLIPConfig.tiny()
            clip_params = init_clip_params(jax.random.PRNGKey(1), clip_cfg)
        if args.clip_bpe:
            bpe = CLIPBPETokenizer.from_merges_file(args.clip_bpe)
        else:
            words = [w for n in meta.nms for w in n.replace(",", " ").split()]
            bpe = CLIPBPETokenizer.toy(words)
        # Fused flat attention for the 577-token vision tower on TPU
        # (CPU keeps the einsum path — the interpreter is slower than XLA).
        clip_impl = "pallas" if jax.default_backend() != "cpu" else "xla"
        clip_model = CLIPModel(clip_cfg, impl=clip_impl)
        scorer = make_clip_scorer(
            clip_model, clip_params, bpe,
            image_size=clip_cfg.vision.image_size,
            context_length=clip_cfg.text.context_length,
        )
    else:
        itc_scorer = make_itc_scorer(model, params)

        def scorer(images, texts):
            return itc_scorer(images, texts, tok, cfg.max_text_len)

    def gradcam_provider(layer, head):
        for img_id, (pooled, names, img) in cache.items():
            maps = pooled[layer - lo, head]
            if args.search == "Unsupervised":
                # Reference Unsupervised_pn_mask_for_clipsim
                # (Dataset.py:103-163): only the top-salience ("top0")
                # class's mask is scored, no ground-truth labels used.
                top = int(np.argmax(maps.sum(axis=(1, 2))))
                yield img_id, (maps[top : top + 1], [names[top]], img)
            else:
                yield img_id, (maps, names, img)

    evaluator = RewardEvaluator(
        gradcam_provider, scorer,
        cache_dir=os.path.join(
            args.save_path, f"Search_{args.search}_{args.data_type}"
        ),
        scale_by_token_contrast=(args.search == "Wsupervised"),
        # Per-image TCSum/TCStd JSONs in the reference layout
        # (Dataset.py:166-210), written next to the reward JSONs.
        token_contrast_dir=os.path.join(args.save_path, "Token_Contrast"),
    )
    best, score, history = run_search(
        evaluator, layers=range(lo, hi + 1),
        heads=range(cfg.bert.num_heads), n_iter=args.n_iter,
    )
    log(f"best config: {best} score {score}")
    return best, score


if __name__ == "__main__":
    main()
