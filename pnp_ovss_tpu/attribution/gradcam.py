"""Functional cross-attention GradCAM (replaces torch hook capture).

Reference: `Files to replace for BLIP/blip_image_text_matching.py:386-457`
(compute_gradcam_ensemble):

    loss  = itm_logits[:, 1].sum()                                  (:399)
    grads = d loss / d cross_attention_probs   (hooks, med.py:280-283)
    gradcam = cams[:,:,:,1:] * relu(grads[:,:,:,1:]) * text_mask    (:427)
    gradcam = relu(gradcam)                                         (:429)
    per head: gradcam[:, head, 1:, :, :]   (drop the [ENC] token row, :433)

TPU-native realisation: the fusion encoder takes an explicit zero "tap"
added to the captured layers' attention probabilities (see models/bert.py).
``jax.value_and_grad`` w.r.t. the tap returns exactly the hook gradients in
one forward+backward, under jit, with only the requested layers captured.
Because the tap sits *after* the softmax, the backward pass never traverses
the ViT — no image-encoder residuals are saved.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def gradcam_from_tap(
    apply_fn,
    params,
    images: jax.Array,  # [B, S, S, 3] normalised NHWC
    input_ids: jax.Array,  # [B, T]
    attention_mask: jax.Array,  # [B, T]
    *,
    num_capture_layers: int,
    num_heads: int,
    num_image_tokens: int,  # patch tokens + image CLS
    grid: int,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (gradcam, itm_logits).

    gradcam: [L, B, H, T-1, grid, grid] — per captured layer and head, with
    the image-CLS column and the [ENC] token row removed and the text mask
    applied, matching the reference formula above.
    """
    b, t = input_ids.shape

    def fwd(tap):
        logits, probs = apply_fn(
            params, images, input_ids, attention_mask, cross_tap=tap
        )
        loss = logits[:, 1].sum()
        return loss, (probs, logits)

    tap0 = jnp.zeros(
        (num_capture_layers, b, num_heads, t, num_image_tokens), jnp.float32
    )
    grad_fn = jax.value_and_grad(fwd, has_aux=True)
    (_, (cams, logits)), grads = grad_fn(tap0)

    # [L, B, H, T, S] -> drop image-CLS column, apply text mask.
    mask = attention_mask.astype(jnp.float32)[None, :, None, :, None]
    gc = cams[..., 1:] * jax.nn.relu(grads[..., 1:]) * mask
    gc = jnp.maximum(gc, 0.0)
    # Drop the [ENC] token row, fold patches to the 2D grid.
    gc = gc[:, :, :, 1:, :].reshape(
        num_capture_layers, b, num_heads, t - 1, grid, grid
    )
    return gc, logits


def gradcam_from_embeds(
    apply_embeds_fn,
    params,
    image_embeds: jax.Array,  # [B, S, width]
    input_ids: jax.Array,
    attention_mask: jax.Array,
    *,
    num_capture_layers: int,
    num_heads: int,
    grid: int,
):
    """GradCAM with the image encoder factored out.

    The ViT forward and the BERT forward+backward compile as separate XLA
    programs — the remote TPU compiler handles the two smaller programs far
    faster than the fused one, and the ViT program is shared with plain
    ITM scoring. Numerically identical to gradcam_from_tap (the tap sits
    after the ViT, so no gradient ever crosses the split).
    """
    b, t = input_ids.shape
    s = image_embeds.shape[1]

    def fwd(tap):
        logits, probs = apply_embeds_fn(
            params, image_embeds, input_ids, attention_mask, cross_tap=tap
        )
        loss = logits[:, 1].sum()
        return loss, (probs, logits)

    tap0 = jnp.zeros((num_capture_layers, b, num_heads, t, s), jnp.float32)
    (_, (cams, logits)), grads = jax.value_and_grad(
        fwd, has_aux=True
    )(tap0)

    mask = attention_mask.astype(jnp.float32)[None, :, None, :, None]
    gc = cams[..., 1:] * jax.nn.relu(grads[..., 1:]) * mask
    gc = jnp.maximum(gc, 0.0)
    gc = gc[:, :, :, 1:, :].reshape(
        num_capture_layers, b, num_heads, t - 1, grid, grid
    )
    return gc, logits


def make_gradcam_fn(model, params, *, layer: int, head: Optional[int] = None):
    """Build a jittable single-(layer[,head]) GradCAM closure.

    Args:
      model: a BlipITM constructed with capture_layers=(layer-1,)
        (``layer`` is the reference's 1-indexed --max_att_block_num).
      head: 0-indexed --prune_att_head; None keeps all heads.

    Returns fn(images, input_ids, attention_mask) ->
      gradcam [B, T-1, g, g] (or [B, H, T-1, g, g] if head is None), logits.
    """
    cfg = model.cfg
    grid = cfg.vit.grid

    def apply_fn(p, images, ids, mask, cross_tap):
        return model.apply(p, images, ids, mask, cross_tap=cross_tap)

    # Params stay a jit ARGUMENT: closing over the weight tree makes XLA
    # constant-fold 300M parameters into the program, exploding compiles.
    @jax.jit
    def _fn(p, images, input_ids, attention_mask):
        gc, logits = gradcam_from_tap(
            apply_fn,
            p,
            images,
            input_ids,
            attention_mask,
            num_capture_layers=1,
            num_heads=cfg.bert.num_heads,
            num_image_tokens=cfg.vit.seq_len,
            grid=grid,
        )
        gc = gc[0]  # single layer
        if head is not None:
            gc = gc[:, head]
        return gc, logits

    def fn(images, input_ids, attention_mask):
        return _fn(params, images, input_ids, attention_mask)

    return fn
