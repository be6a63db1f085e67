"""Search rewards: CLIP-similarity positive/negative masks + token contrast.

Reference semantics (Dataset.py:212-340, driver :156-192, :1229-1311):

- per image and GT class, binarise the class's attention map at ``min_att``,
  resize+blur to CLIP resolution, multiply into the image -> "positive"
  masked input; the "negative" input is an all-black image (the reference
  sets prediction_mask_neg = zeros, Dataset.py:277),
- a CLIP-style scorer embeds all masked images and the class names; per
  class, softmax over classes at temperature 0.01 (driver :170-172); the
  reward counts classes whose positive diagonal probability beats the
  negative one (pos_win_sum, :183-185),
- token contrast: mean of the [K, K] cosine-similarity matrix of the
  per-class maps (TCSum) and its std (TCStd) (Dataset.py:165-210); the
  scaled reward is pos_win_sum * (1 - TCSum) (:1291-1292).

The scorer is pluggable: any callable (images [N,H,W,3], texts) ->
probs [N, num_texts]. models/blip_itm.BlipITM.itc provides one; the
reference instead loads LAVIS CLIP ViT-L-14-336 (:1370-1372).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pnp_ovss_tpu.ops.blur import gaussian_blur2d
from pnp_ovss_tpu.ops.resize import resize_bilinear_align_corners


def token_contrast(maps: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """maps: [B, K, h, w] -> (TCSum [B], TCStd [B]).

    Mean and std of the per-image [K, K] cosine-similarity matrix between
    flattened token maps (Dataset.py:165-210).
    """
    b, k, h, w = maps.shape
    x = maps.reshape(b, k, h * w).astype(jnp.float32)
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    xn = x / jnp.maximum(norm, 1e-8)
    sim = jnp.einsum("bkn,bln->bkl", xn, xn)
    return sim.mean(axis=(1, 2)), sim.std(axis=(1, 2))


def build_pos_masks(
    class_maps: np.ndarray,  # [K, g, g] attention maps (0-1-ish)
    image: np.ndarray,  # [H, W, 3] CLIP-preprocessed image
    min_att: float,
    *,
    blur_sigma: float = 2.0,
    token_grid: int = 24,
) -> Tuple[np.ndarray, np.ndarray]:
    """-> (masked images [K, H, W, 3], token maps [K, 24, 24]).

    Binarise at min_att, upsample to image size, blur, multiply
    (Dataset.py:253-268).
    """
    k = class_maps.shape[0]
    h, w = image.shape[:2]
    binary = (class_maps > min_att).astype(np.float32)
    up = np.asarray(
        resize_bilinear_align_corners(jnp.asarray(binary), h, w)
    )
    up = np.asarray(gaussian_blur2d(jnp.asarray(up), blur_sigma))
    token = np.asarray(
        resize_bilinear_align_corners(jnp.asarray(up), token_grid, token_grid)
    )
    masked = up[..., None] * image[None]
    return masked, token


def pos_win_reward(
    probs: np.ndarray,  # [2K, K]: rows = pos masks then neg masks
    num_classes: int,
) -> Tuple[float, int]:
    """(avg_negoverpos, pos_win_sum) — reference :176-192."""
    pos = np.diagonal(probs[:num_classes, :])
    neg = np.diagonal(probs[num_classes:, :])
    pos_win = int(np.sum(pos > neg))
    avg_negoverpos = float(np.mean(neg / np.maximum(pos, 1e-12)))
    return avg_negoverpos, pos_win


class RewardEvaluator:
    """Evaluates one (layer, head, min_att) config over a set of images.

    ``gradcam_provider(layer, head)`` -> list over images of
    ([K_i, g, g] maps, [K_i] class names, image [H, W, 3]).
    ``scorer(images [N, H, W, 3], texts)`` -> probs [N, len(texts)].
    Memoises per-config rewards as JSON (reference :1241-1247).
    """

    def __init__(self, gradcam_provider, scorer, *, cache_dir: Optional[str] = None,
                 scale_by_token_contrast: bool = False,
                 token_contrast_dir: Optional[str] = None):
        self.gradcam_provider = gradcam_provider
        self.scorer = scorer
        self.cache_dir = cache_dir
        self.scale_by_token_contrast = scale_by_token_contrast
        self.token_contrast_dir = token_contrast_dir

    def _write_token_contrast(self, layer: int, head: int, min_att: float,
                              img_id, tc_sum: float, tc_std: float):
        """Per-image token-contrast JSON in the reference's exact layout
        (Dataset.py token_cos_sim_map, :166-210: Token_Contrast/
        max_att_block_num{L}_atthead{H}_withatt{T}/Token_contrast_sum/
        img_{id}.json with TCSum_/TCStd_ keys) so downstream consumers —
        including the reference's own Search, which re-reads these files
        (driver :1474-1478) — are drop-in compatible."""
        if not self.token_contrast_dir:
            return
        d = os.path.join(
            self.token_contrast_dir,
            f"max_att_block_num{layer}_atthead{head}"
            f"_withatt{int(min_att * 100)}",
            "Token_contrast_sum",
        )
        os.makedirs(d, exist_ok=True)
        payload = {
            f"TCSum_layer{layer}_head{head}_img_{img_id}": float(tc_sum),
            f"TCStd_layer{layer}_head{head}_img_{img_id}": float(tc_std),
        }
        with open(os.path.join(d, f"img_{img_id}.json"), "w") as f:
            json.dump(payload, f)

    def _cache_path(self, layer: int, head: int, min_att: float) -> Optional[str]:
        if not self.cache_dir:
            return None
        d = os.path.join(self.cache_dir, f"layer{layer}_head{head}")
        os.makedirs(d, exist_ok=True)
        return os.path.join(
            d, f"reward_metric_dict_attthresh{int(min_att * 100)}.json"
        )

    def __call__(self, config: Dict) -> float:
        layer, head = int(config["layer"]), int(config["head"])
        min_att = float(config["min_att"])
        path = self._cache_path(layer, head, min_att)
        key = f"total_pos_win_sum_layer{layer}_head{head}"
        skey = f"total_pos_win_sum_scaleby_tokencontrast_layer{layer}_head{head}"
        if path and os.path.exists(path):
            with open(path) as f:
                cached = json.load(f)
            return cached[skey if self.scale_by_token_contrast else key]

        total = 0.0
        total_scaled = 0.0
        detail: Dict[str, float] = {}
        for img_id, (maps, names, image) in self.gradcam_provider(layer, head):
            if len(names) == 0:
                continue
            masked, token_maps = build_pos_masks(maps, image, min_att)
            tc_sum, tc_std = token_contrast(jnp.asarray(token_maps)[None])
            self._write_token_contrast(
                layer, head, min_att, img_id,
                float(tc_sum[0]), float(tc_std[0]),
            )
            neg = np.zeros_like(masked)
            probs = self.scorer(
                np.concatenate([masked, neg], axis=0), list(names)
            )
            _, pos_win = pos_win_reward(np.asarray(probs), len(names))
            total += pos_win
            scaled = pos_win * (1.0 - float(tc_sum[0]))
            total_scaled += scaled
            detail[f"{img_id}_pos_win_sum"] = pos_win
            detail[f"{img_id}_pos_win_sum_scaleby_tokencontrast"] = scaled

        detail[key] = total
        detail[skey] = total_scaled
        if path:
            # Reference sorts the reward dict by value before dumping
            # (driver :1496); totals sort to the end the same way.
            detail = {k: v for k, v in
                      sorted(detail.items(), key=lambda kv: kv[1])}
            with open(path, "w") as f:
                json.dump(detail, f)
        return total_scaled if self.scale_by_token_contrast else total
