"""BLIP image-text-matching model (Flax).

Assembly matches reference `Files to replace for BLIP/blip_image_text_matching.py`:
- ViT image encoder -> patch embeddings (ITM path, :222-224),
- text token 0 replaced with the [ENC] token id by the caller (:238-239),
- fusion encoder in multimodal mode over (text, image) (:240-247),
- ITM head: Linear(hidden, 2) on the [ENC] position output (:248-249),
- ITC heads: vision_proj/text_proj to embed_dim=256 (:251-263) — used by the
  hyperparameter-search reward path.

The forward is purely functional: it takes pre-tokenised ids (host-side
WordPiece, see text/wordpiece.py) and returns the ITM logits plus the
captured cross-attention probabilities for the configured GradCAM layers.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pnp_ovss_tpu.config import ModelConfig
from pnp_ovss_tpu.models.bert import BertFusionEncoder
from pnp_ovss_tpu.models.vit import VisionTransformer


class BlipITM(nn.Module):
    cfg: ModelConfig
    capture_layers: Tuple[int, ...] = ()
    attn_impl: str = "pallas"

    def setup(self):
        self.visual_encoder = VisionTransformer(
            self.cfg.vit, impl=self.attn_impl, name="visual_encoder"
        )
        self.text_encoder = BertFusionEncoder(
            self.cfg.bert, capture_layers=self.capture_layers,
            name="text_encoder",
        )
        self.itm_head = nn.Dense(2, dtype=jnp.float32, name="itm_head")
        self.vision_proj = nn.Dense(
            self.cfg.embed_dim, dtype=jnp.float32, name="vision_proj"
        )
        self.text_proj = nn.Dense(
            self.cfg.embed_dim, dtype=jnp.float32, name="text_proj"
        )

    def encode_image(self, images: jax.Array) -> jax.Array:
        """images: [B, H, W, 3] normalised NHWC -> [B, S, width]."""
        return self.visual_encoder(images)

    def itm_from_embeds(
        self,
        image_embeds: jax.Array,
        input_ids: jax.Array,
        attention_mask: jax.Array,
        cross_tap: Optional[jax.Array] = None,
    ):
        """ITM logits from precomputed image embeddings.

        Returns (logits [B, 2], captured_probs or None).
        """
        hidden, probs = self.text_encoder(
            input_ids, attention_mask, image_embeds, cross_tap
        )
        logits = self.itm_head(hidden[:, 0, :].astype(jnp.float32))
        return logits, probs

    def __call__(
        self,
        images: jax.Array,
        input_ids: jax.Array,
        attention_mask: jax.Array,
        cross_tap: Optional[jax.Array] = None,
    ):
        image_embeds = self.encode_image(images)
        return self.itm_from_embeds(
            image_embeds, input_ids, attention_mask, cross_tap
        )

    def init_all(
        self,
        images: jax.Array,
        input_ids: jax.Array,
        attention_mask: jax.Array,
    ):
        """Init-only method touching every head so all params materialise."""
        out = self(images, input_ids, attention_mask)
        _ = self.itc(images, input_ids, attention_mask)
        return out

    def itm_rank(
        self,
        image_embeds: jax.Array,
        input_ids: jax.Array,
    ) -> jax.Array:
        """ITM match probability for ranking (reference itm_rank :267-295).

        Drops the first 3 tokens of the given ids, swaps position 0 to
        [ENC] (the caller passes ids whose slice [3:] starts at a caption
        body, matching the reference's prompt-stripping), masks on
        non-pad tokens and returns softmax(itm)[:, 1].
        """
        ids = input_ids[:, 3:]
        ids = ids.at[:, 0].set(self.cfg.bert.enc_token_id)
        mask = (ids != self.cfg.bert.pad_token_id).astype(jnp.int32)
        logits, _ = self.itm_from_embeds(image_embeds, ids, mask)
        return jax.nn.softmax(logits, axis=1)[:, 1]

    def itc(
        self,
        images: jax.Array,
        input_ids: jax.Array,
        attention_mask: jax.Array,
    ) -> jax.Array:
        """ITC similarity matrix (reference :251-263).

        The text side runs the fusion encoder in text-only mode (the
        reference's mode="text", which skips cross-attention); features are
        L2-normalised projections of the image CLS / text CLS outputs.
        """
        image_embeds = self.encode_image(images)
        img_feat = self.vision_proj(image_embeds[:, 0, :].astype(jnp.float32))
        img_feat = img_feat / jnp.linalg.norm(img_feat, axis=-1, keepdims=True)

        hidden, _ = self.text_encoder(input_ids, attention_mask, None)
        txt_feat = self.text_proj(hidden[:, 0, :].astype(jnp.float32))
        txt_feat = txt_feat / jnp.linalg.norm(txt_feat, axis=-1, keepdims=True)
        return img_feat @ txt_feat.T


def init_params(rng: jax.Array, cfg: ModelConfig,
                capture_layers: Tuple[int, ...] = (),
                attn_impl: str = "xla"):
    """Random-init parameters (tests / benchmarking without a checkpoint)."""
    model = BlipITM(cfg, capture_layers=capture_layers, attn_impl=attn_impl)
    b, s = 1, cfg.max_text_len
    images = jnp.zeros((b, cfg.vit.image_size, cfg.vit.image_size, 3),
                       jnp.float32)
    ids = jnp.zeros((b, s), jnp.int32)
    mask = jnp.ones((b, s), jnp.int32)
    return jax.jit(
        functools.partial(model.init, method=BlipITM.init_all)
    )(rng, images, ids, mask)
