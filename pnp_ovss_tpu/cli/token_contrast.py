"""Token-contrast ablation over all layers/heads.

Reference: ``--cal_token_sim_forall_layerhead`` (drivers :110-153,
:1414-1436) — per (layer, head), the mean cosine similarity between
per-class token maps, aggregated across images into
``Token_Contrast/sum_token_contrast.json``. Low contrast (maps pointing at
different regions per class) correlates with good localisation heads.

TPU-native: the full 12x12 ensemble is captured in one forward+backward per
image and the [L, H] contrast matrix reduces on device.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict

import numpy as np


def token_contrast_all_heads(pooled_maps) -> np.ndarray:
    """pooled_maps: [L, H, K, g, g] per-class maps -> TCSum [L, H]."""
    import jax.numpy as jnp

    from pnp_ovss_tpu.search.reward import token_contrast

    l, h, k, g, _ = pooled_maps.shape
    tc, _ = token_contrast(jnp.asarray(pooled_maps.reshape(l * h, k, g, g)))
    return np.asarray(tc).reshape(l, h)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_type", required=True)
    p.add_argument("--home_dir", required=True)
    p.add_argument("--save_path", required=True)
    p.add_argument("--limit", type=int, default=100)
    p.add_argument("--img_size", type=int, default=336)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--vocab", default=None)
    p.add_argument("--tiny", action="store_true",
                   help="tiny random model (machinery smoke / e2e tests)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from pnp_ovss_tpu.cli.search import ensemble_gradcam_fn
    from pnp_ovss_tpu.config import ModelConfig, ViTConfig
    from pnp_ovss_tpu.data import transforms
    from pnp_ovss_tpu.data.categories import get_dataset_meta
    from pnp_ovss_tpu.data.datasets import make_dataset
    from pnp_ovss_tpu.models.blip_itm import BlipITM, init_params
    from pnp_ovss_tpu.ops.segment_pool import pool_token_maps
    from pnp_ovss_tpu.text.captions import build_caption_batch
    from pnp_ovss_tpu.text.wordpiece import WordPieceTokenizer
    from pnp_ovss_tpu.utils.logging import log

    cfg = (ModelConfig.tiny() if args.tiny
           else ModelConfig(vit=ViTConfig(image_size=args.img_size)))
    meta = get_dataset_meta(args.data_type)
    capture = tuple(range(cfg.bert.num_layers))
    model = BlipITM(cfg, capture_layers=capture)
    if args.checkpoint:
        from pnp_ovss_tpu.models.convert import load_torch_checkpoint

        params = load_torch_checkpoint(args.checkpoint, cfg, capture)
    else:
        log("WARNING: random weights")
        params = init_params(jax.random.PRNGKey(0), cfg, capture)
    tok = (WordPieceTokenizer.from_vocab_file(args.vocab) if args.vocab
           else WordPieceTokenizer.toy(["a", "picture", "of"] + meta.nms))

    gc_fn = ensemble_gradcam_fn(model, params, cfg)

    ds = make_dataset(args.data_type, args.home_dir)
    records = list(ds.records())[: args.limit]
    sums = np.zeros((cfg.bert.num_layers, cfg.bert.num_heads))
    count = 0
    for rec in records:
        raw = transforms.load_rgb(rec.image_path)
        gt = rec.load_gt()
        gt_ids = [int(i) for i in np.unique(gt) if 0 < i < len(meta.nms) + 1]
        names = [meta.nms[i - 1] for i in gt_ids]
        if len(names) < 2:
            continue
        from pnp_ovss_tpu.text.captions import fitted_text_len

        cap = build_caption_batch(
            [names], tok,
            max_text_len=fitted_text_len(
                [names], tok, max_text_len=cfg.max_text_len
            ),
            max_classes=28,
        )
        img = transforms.preprocess_image(raw, cfg.vit.image_size)
        gc, _ = gc_fn(jnp.asarray(img[None]), jnp.asarray(cap.input_ids),
                      jnp.asarray(cap.attention_mask))
        k = int(cap.num_classes[0])
        pooled = np.stack([
            np.asarray(pool_token_maps(jnp.asarray(cap.pool_matrix),
                                       gc[l, :, h]))[0, :k]
            for l in range(gc.shape[0]) for h in range(gc.shape[2])
        ]).reshape(gc.shape[0], gc.shape[2], k, cfg.vit.grid, cfg.vit.grid)
        sums += token_contrast_all_heads(pooled)
        count += 1

    out_dir = os.path.join(args.save_path, "Token_Contrast")
    os.makedirs(out_dir, exist_ok=True)
    result: Dict[str, float] = {}
    for l in range(sums.shape[0]):
        for h in range(sums.shape[1]):
            result[f"TCSum_layer{l + 1}_head{h}"] = float(
                sums[l, h] / max(count, 1)
            )
    with open(os.path.join(out_dir, "sum_token_contrast.json"), "w") as f:
        json.dump(result, f, indent=2)
    log(f"token contrast over {count} images -> {out_dir}")
    return result


if __name__ == "__main__":
    main()
