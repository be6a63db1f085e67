"""Iterative salience drop — the paper's key trick, as a lax.scan.

Reference: `PnP_OVSS_0514_updated_segmentation.py:564-722`
(Inference_BLIP_filteredcaption). Per round:

1. zero the 16x16 pixel blocks of all previously-dropped patches in the
   input image (:589-605) — here a pure-functional multiply by a keep-mask,
2. run BLIP + GradCAM on the masked image,
3. zero the gradcam at already-dropped patch positions (:623-634),
4. sum the gradcam over token rows [3:-1] (class tokens + SEP; :637-641)
   and pick the top-10 not-yet-dropped patches to drop next (:643-647).

Aggregation reproduces the reference's round-0 double count (:716-721):
``agg = round0 + sum(all rounds)``; a `double_count_round0=False` fix flag
is exposed via DropConfig.

Divergence note (documented for parity): when fewer than
``patches_per_round`` patches have positive salience, the reference's
np.argsort may re-select already-dropped zero-salience patches; we set
dropped patches to -inf so they are never re-selected.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from pnp_ovss_tpu.config import DropConfig


def expand_patch_mask_to_pixels(keep: jax.Array, patch_size: int) -> jax.Array:
    """[B, g, g] {0,1} patch keep-mask -> [B, g*ps, g*ps, 1] pixel mask."""
    b, g, _ = keep.shape
    m = keep[:, :, None, :, None]
    m = jnp.broadcast_to(m, (b, g, patch_size, g, patch_size))
    return m.reshape(b, g * patch_size, g * patch_size, 1)


def salience_drop_loop(
    gradcam_fn,
    images: jax.Array,  # [B, S, S, 3] normalised NHWC
    input_ids: jax.Array,
    attention_mask: jax.Array,
    *,
    cfg: DropConfig,
    grid: int,
    patch_size: int,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (gradcam_round0, gradcam_agg), each [B, T-1, grid, grid].

    gradcam_fn(images, ids, mask) -> ([B, T-1, g, g], logits) — a
    single-(layer, head) GradCAM closure (attribution/gradcam.py).
    """
    b = images.shape[0]
    num_patches = grid * grid
    k_drop = min(cfg.patches_per_round, num_patches)

    def round_body(carry, _):
        dropped, agg, gc0, round_idx = carry
        keep = 1.0 - dropped.reshape(b, grid, grid)
        pixel_keep = expand_patch_mask_to_pixels(keep, patch_size)
        gc, _ = gradcam_fn(images * pixel_keep, input_ids, attention_mask)
        # Zero gradcam at patches dropped before this round (:623-634).
        gc = gc * keep[:, None, :, :]

        agg = agg + gc
        gc0 = jnp.where(round_idx == 0, gc, gc0)

        # Salience: sum over token rows [3:-1] (:637-641). Row i of the
        # gradcam corresponds to text token i+1 ([ENC] row removed), so
        # rows 3:-1 are tokens 4..T-2: the class tokens and SEP. Padding
        # rows are already zero (text mask applied inside gradcam).
        salience = gc[:, 3:-1].sum(axis=1).reshape(b, num_patches)
        salience = jnp.where(dropped > 0, -jnp.inf, salience)
        _, top_idx = jax.lax.top_k(salience, k_drop)
        new_drops = jax.nn.one_hot(top_idx, num_patches, dtype=dropped.dtype)
        dropped = jnp.clip(dropped + new_drops.sum(axis=1), 0.0, 1.0)
        return (dropped, agg, gc0, round_idx + 1), None

    # Initialise carry with a zeroed gradcam of the right shape by running
    # shape inference only (no FLOPs at trace time).
    gc_shape = jax.eval_shape(
        lambda im: gradcam_fn(im, input_ids, attention_mask)[0], images
    )
    zeros_gc = jnp.zeros(gc_shape.shape, gc_shape.dtype)

    carry0 = (
        jnp.zeros((b, num_patches), jnp.float32),
        zeros_gc,
        zeros_gc,
        jnp.int32(0),
    )
    (dropped, agg, gc0, _), _ = jax.lax.scan(
        round_body, carry0, None, length=cfg.num_rounds
    )

    if cfg.double_count_round0:
        # Reference :716-721: agg initialised to round 0 then += all rounds.
        agg = agg + gc0
    return gc0, agg


def run_drop_rounds(round_step, images, input_ids, attention_mask,
                    *, cfg: DropConfig, num_patches: int):
    """Host loop over drop rounds. Same semantics as salience_drop_loop."""
    b = images.shape[0]
    dropped = jnp.zeros((b, num_patches), jnp.float32)
    gc0 = None
    agg = None
    for r in range(cfg.num_rounds):
        dropped, gc = round_step(dropped, images, input_ids, attention_mask)
        if r == 0:
            gc0 = gc
            agg = gc
        else:
            agg = agg + gc
    if cfg.double_count_round0:
        agg = agg + gc0
    return gc0, agg


def make_split_round_step(embed_fn, bert_gradcam_fn, *, cfg: DropConfig,
                          grid: int, patch_size: int):
    """Two-program round step: (1) mask+ViT-encode, (2) BERT gradcam+top-k.

    Splitting at the image-embedding boundary keeps each compiled program
    small, and the encode program is shared with plain ITM scoring. No
    gradient crosses the split (the GradCAM tap sits after the ViT).

    ``embed_fn(params, images)`` and ``bert_gradcam_fn(params, embeds, ids,
    mask)`` must take params EXPLICITLY: closing over the 300M-parameter
    tree makes XLA treat the weights as compile-time constants, which blows
    compile time up by an order of magnitude (constant folding over the
    whole model).
    """
    num_patches = grid * grid
    k_drop = min(cfg.patches_per_round, num_patches)

    @jax.jit
    def encode_step(params, dropped, images):
        b = images.shape[0]
        keep = 1.0 - dropped.reshape(b, grid, grid)
        pixel_keep = expand_patch_mask_to_pixels(keep, patch_size)
        return embed_fn(params, images * pixel_keep)

    @jax.jit
    def bert_step(params, dropped, image_embeds, input_ids, attention_mask):
        b = image_embeds.shape[0]
        keep = 1.0 - dropped.reshape(b, grid, grid)
        gc, _ = bert_gradcam_fn(params, image_embeds, input_ids,
                                attention_mask)
        gc = gc * keep[:, None, :, :]
        salience = gc[:, 3:-1].sum(axis=1).reshape(b, num_patches)
        salience = jnp.where(dropped > 0, -jnp.inf, salience)
        _, top_idx = jax.lax.top_k(salience, k_drop)
        new_drops = jax.nn.one_hot(top_idx, num_patches, dtype=dropped.dtype)
        dropped = jnp.clip(dropped + new_drops.sum(axis=1), 0.0, 1.0)
        return dropped, gc

    def round_step(params, dropped, images, input_ids, attention_mask):
        embeds = encode_step(params, dropped, images)
        return bert_step(params, dropped, embeds, input_ids, attention_mask)

    return round_step
