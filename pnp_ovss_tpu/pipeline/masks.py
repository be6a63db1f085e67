"""Mask construction: normalise -> threshold -> resize -> background -> argmax.

Reference: driver :348-379 (1-drop path) and :418-470 (N-drop path), with
these pinned quirks preserved:

- per-class min-max normalisation decides the threshold, but the threshold
  mask multiplies the *unnormalised* map (:354-355),
- after bilinear (align_corners=True) resize to evaluation resolution, the
  1-drop path rescales each class map to 0-1 (Scale_0_1, :362) while the
  N-drop (aggregated) path does NOT (the call is commented out, :441),
- a background channel = (max over class maps == 0) is synthesised (:370);
  context datasets (psc/ade20k/coco_stuff) skip it when >= 3 classes were
  proposed (:372-379),
- constant maps (max == min) produce no thresholded pixels (torch yields
  NaN -> all-False comparisons; here an explicit zero), so padded class
  slots contribute nothing.

Channel -> dataset-category remap is a collision-free table lookup; the
reference's descending in-place loop (:390-399) is equivalent when GPT class
ids are ascending (their usual order) and buggy otherwise.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from pnp_ovss_tpu.ops.resize import resize_bilinear_align_corners


def threshold_maps(pooled: jax.Array, threshold: float) -> jax.Array:
    """pooled: [B, K, g, g] >= 0 -> masked raw maps (reference :348-356)."""
    flat = pooled.reshape(*pooled.shape[:2], -1)
    mn = flat.min(axis=-1)[:, :, None, None]
    mx = flat.max(axis=-1)[:, :, None, None]
    denom = mx - mn
    normed = jnp.where(denom > 0, (pooled - mn) / jnp.where(denom > 0, denom, 1.0), 0.0)
    return pooled * (normed >= threshold)


def rescale_0_1(maps: jax.Array) -> jax.Array:
    """Per-class min-max to [0, 1] (reference Scale_0_1, :1080-1103)."""
    flat = maps.reshape(*maps.shape[:-2], -1)
    mn = flat.min(axis=-1)[..., None, None]
    mx = flat.max(axis=-1)[..., None, None]
    denom = jnp.where(mx - mn > 0, mx - mn, 1.0)
    return (maps - mn) / denom


def upsample_maps(
    maps: jax.Array, out_h: int, out_w: int, *, rescale: bool
) -> jax.Array:
    """[B, K, g, g] -> [B, K, H, W]; rescale=True for the 1-drop path."""
    up = resize_bilinear_align_corners(maps, out_h, out_w)
    return rescale_0_1(up) if rescale else up


def add_background(maps: jax.Array) -> jax.Array:
    """[..., K, H, W] -> [..., K+1, H, W] with channel 0 = (max == 0)."""
    mx = maps.max(axis=-3, keepdims=True)
    background = (mx == 0).astype(maps.dtype)
    return jnp.concatenate([background, maps], axis=-3)


def argmax_labels(maps_wbg: jax.Array) -> jax.Array:
    """Channel argmax -> [..., H, W] int32 channel indices."""
    return jnp.argmax(maps_wbg, axis=-3).astype(jnp.int32)


def remap_channels_to_categories(
    labels: np.ndarray,
    category_ids: np.ndarray,
    *,
    include_background: bool,
    max_channels: int,
) -> np.ndarray:
    """Map channel indices to dataset category ids via a lookup table.

    ``category_ids[k]`` is the dataset id of proposed class k — idx+1 for
    voc/psc/ade20k (reference :390-399), the sparse COCO id for coco_*
    (coco driver :459-463,549-556).

    include_background: channel 0 stays 0, channel i+1 -> category_ids[i].
    Otherwise channel i -> category_ids[i].
    """
    table = np.zeros((max_channels + 1,), np.int32)
    k = len(category_ids)
    if include_background:
        table[1 : k + 1] = np.asarray(category_ids[:k], np.int32)
    else:
        table[:k] = np.asarray(category_ids[:k], np.int32)
    return table[labels]


def context_includes_background(
    data_type: str, num_proposed: int, *, max_for_background: int = 3
) -> bool:
    """Background-channel rule (reference :372-379).

    Object datasets (voc, coco_object) always get a background channel;
    context datasets (psc, ade20k, coco_stuff) only when fewer than 3
    classes were proposed.
    """
    if data_type in ("voc", "coco_object"):
        return True
    return num_proposed < max_for_background
