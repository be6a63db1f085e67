"""Flax CLIP dual encoder — the search subsystem's independent reward model.

The reference scores its hyperparameter search with LAVIS
`clip_feature_extractor ViT-L-14-336` (driver :1370-1372): an OpenAI CLIP
with a ViT-L/14 vision tower at 336px and a 12-layer causal text
transformer, producing L2-normalised projected embeddings whose dot product
(divided by temperature 0.01, driver :166-167) softmaxes into class
probabilities.

Topology follows the OpenAI CLIP reference implementation:
- vision: bias-free patch conv, learned class embedding + positions, ln_pre,
  pre-LN residual blocks with quickGELU MLPs, ln_post on the CLS token, and
  a linear projection to the shared embedding space,
- text: token + position embeddings, the same blocks under a causal mask,
  ln_final, features read at the EOT token (argmax of ids), projected.

TPU-native: NHWC conv, bf16 compute / f32 LayerNorm+softmax, nn.scan-stacked
blocks (one HLO body for 24 layers), flash attention for the 577-token
vision sequence.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pnp_ovss_tpu.config import CLIPConfig, CLIPTextConfig, CLIPVisionConfig
from pnp_ovss_tpu.ops import attention as attn_ops
from pnp_ovss_tpu.ops import flash_attention as _flash


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPBlock(nn.Module):
    """Pre-LN residual block with quickGELU MLP (shared by both towers)."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float
    eps: float
    dtype: str
    causal: bool = False
    impl: str = "xla"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dtype = jnp.dtype(self.dtype)
        b, s, _ = x.shape
        head_dim = self.hidden_size // self.num_heads

        h = nn.LayerNorm(epsilon=self.eps, dtype=jnp.float32,
                         name="ln_1")(x).astype(dtype)
        qkv = nn.Dense(3 * self.hidden_size, dtype=dtype, name="qkv")(h)
        if (
            not self.causal and self.impl == "pallas"
            and _flash.flat_supported(s, self.num_heads, head_dim)
        ):
            # Vision tower (577 tokens at 336px): q/k/v as BlockSpec views
            # into the qkv output, zero head transposes — same fused flat
            # kernel as the BLIP ViT (ops/flash_attention.py).
            out = _flash.flash_mha_from_qkv(
                qkv, num_heads=self.num_heads, out_dtype=dtype,
            )
        else:
            qkv = qkv.reshape(b, s, 3, self.num_heads, head_dim)
            q, k, v = (
                jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3)
            )
            bias = None
            if self.causal:
                bias = jnp.triu(
                    jnp.full((s, s), -1e9, jnp.float32), k=1
                )[None, None]
            out = attn_ops.mha(q, k, v, bias, impl=self.impl,
                               out_dtype=dtype)
            out = jnp.transpose(out, (0, 2, 1, 3)).reshape(
                b, s, self.hidden_size
            )
        x = x + nn.Dense(self.hidden_size, dtype=dtype, name="proj")(out)

        h = nn.LayerNorm(epsilon=self.eps, dtype=jnp.float32,
                         name="ln_2")(x).astype(dtype)
        h = nn.Dense(int(self.hidden_size * self.mlp_ratio), dtype=dtype,
                     name="c_fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.hidden_size, dtype=dtype, name="c_proj")(h)
        return x + h


class _ScannedCLIPBlock(nn.Module):
    hidden_size: int
    num_heads: int
    mlp_ratio: float
    eps: float
    dtype: str
    causal: bool
    impl: str

    @nn.compact
    def __call__(self, x, _):
        return CLIPBlock(
            self.hidden_size, self.num_heads, self.mlp_ratio, self.eps,
            self.dtype, causal=self.causal, impl=self.impl, name="block",
        )(x), None


def _stack(num_layers, name, **kw):
    return nn.scan(
        _ScannedCLIPBlock,
        variable_axes={"params": 0},
        split_rngs={"params": True},
        length=num_layers,
    )(name=name, **kw)


class CLIPVisionTower(nn.Module):
    cfg: CLIPVisionConfig
    impl: str = "xla"

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """[B, H, W, 3] CLIP-normalised NHWC -> [B, embed_dim] (unnormalised)."""
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        b = images.shape[0]

        x = nn.Conv(
            c.hidden_size, kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), padding="VALID",
            use_bias=False,  # OpenAI conv1 has no bias
            dtype=dtype, name="patch_embed",
        )(images.astype(dtype))
        x = x.reshape(b, c.num_patches, c.hidden_size)

        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02),
            (c.hidden_size,), jnp.float32,
        )
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (c.num_patches + 1, c.hidden_size), jnp.float32,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(dtype), (b, 1, c.hidden_size)), x],
            axis=1,
        )
        x = x + pos.astype(dtype)[None]
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         name="ln_pre")(x).astype(dtype)

        x, _ = _stack(
            c.num_layers, "blocks", hidden_size=c.hidden_size,
            num_heads=c.num_heads, mlp_ratio=c.mlp_ratio,
            eps=c.layer_norm_eps, dtype=c.dtype, causal=False,
            impl=self.impl,
        )(x, None)

        cls_out = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                               name="ln_post")(x[:, 0])
        proj = self.param(
            "proj", nn.initializers.normal(0.02),
            (c.hidden_size, c.embed_dim), jnp.float32,
        )
        return (cls_out.astype(dtype) @ proj.astype(dtype)).astype(
            jnp.float32
        )


class CLIPTextTower(nn.Module):
    cfg: CLIPTextConfig
    impl: str = "xla"

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        """[B, T] int32 BPE ids (SOT ... EOT, zero-padded) -> [B, embed_dim].

        Features are read at the EOT position = argmax of ids (EOT is the
        largest id in CLIP's vocab; padding is 0)."""
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        x = nn.Embed(c.vocab_size, c.hidden_size, dtype=dtype,
                     name="token_embedding")(ids)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.01),
            (c.context_length, c.hidden_size), jnp.float32,
        )
        x = x + pos.astype(dtype)[None, : ids.shape[1]]

        x, _ = _stack(
            c.num_layers, "blocks", hidden_size=c.hidden_size,
            num_heads=c.num_heads, mlp_ratio=c.mlp_ratio,
            eps=c.layer_norm_eps, dtype=c.dtype, causal=True,
            impl=self.impl,
        )(x, None)

        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         name="ln_final")(x)
        eot = jnp.argmax(ids, axis=-1)
        feats = jnp.take_along_axis(
            x, eot[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]
        proj = self.param(
            "text_projection", nn.initializers.normal(0.01),
            (c.hidden_size, c.embed_dim), jnp.float32,
        )
        return (feats.astype(dtype) @ proj.astype(dtype)).astype(jnp.float32)


class CLIPModel(nn.Module):
    """encode_image / encode_text return L2-normalised embeddings (the
    LAVIS extract_features *_embeds_proj the reference consumes,
    driver :161-165)."""

    cfg: CLIPConfig
    impl: str = "xla"

    def setup(self):
        self.visual = CLIPVisionTower(self.cfg.vision, impl=self.impl)
        self.text = CLIPTextTower(self.cfg.text, impl=self.impl)

    def encode_image(self, images: jax.Array) -> jax.Array:
        z = self.visual(images)
        return z / jnp.linalg.norm(z, axis=-1, keepdims=True)

    def encode_text(self, ids: jax.Array) -> jax.Array:
        z = self.text(ids)
        return z / jnp.linalg.norm(z, axis=-1, keepdims=True)

    def __call__(
        self, images: jax.Array, ids: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        return self.encode_image(images), self.encode_text(ids)


def init_clip_params(rng, cfg: CLIPConfig, *, impl: str = "xla"):
    model = CLIPModel(cfg, impl=impl)
    images = jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3))
    ids = jnp.zeros((1, cfg.text.context_length), jnp.int32)
    return model.init(rng, images, ids)
