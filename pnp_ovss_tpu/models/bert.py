"""Flax BERT fusion encoder ("med") with functional attention capture.

Topology matches the reference `Files to replace for BLIP/med.py`:
- word + absolute-position embeddings, LayerNorm, (med.py:56-120),
- 12 post-LN layers; every layer runs text self-attention, then
  cross-attention over the ViT patch embeddings, then the FFN
  (BertLayer, med.py:413-524; BLIP sets fusion_layer = num_layers so
  add_cross_attention applies to all layers, med.py:436-440),
- additive text mask ``(1 - mask) * -10000`` (med.py:851),
- cross-attention K/V projected from encoder_width=1024 image embeddings,
  with the image side fully visible (encoder_attention_mask is all ones in
  the ITM path — blip_image_text_matching.py:222-224).

Attention capture, TPU-native: the reference stores cross-attention
probabilities on the module and registers backward hooks
(med.py:162-183,280-283). Hooks do not exist under jit, so instead the
encoder takes an explicit ``cross_tap`` input — a zeros array added to the
captured layers' probabilities exactly where torch's hook observes them
(post-softmax, pre-dropout; dropout is identity at eval). The probabilities
are returned as an auxiliary output and ``jax.grad`` w.r.t. the tap yields
the same gradients torch's ``register_hook`` captures, because the
probabilities' only consumer is the context matmul (med.py:295-297).
Only the requested layers are captured, keeping memory flat (the reference
saves probs+grads for all 12 layers: B x 12 x 500 x 442 floats each).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pnp_ovss_tpu.config import BertConfig
from pnp_ovss_tpu.ops import attention as attn_ops


class BertSelfAttentionBlock(nn.Module):
    """Post-LN self-attention sublayer (attention + output projection)."""

    cfg: BertConfig

    @nn.compact
    def __call__(self, x: jax.Array, bias: jax.Array) -> jax.Array:
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        b, t, _ = x.shape

        def heads(name):
            y = nn.Dense(c.hidden_size, dtype=dtype, name=name)(x)
            return jnp.transpose(
                y.reshape(b, t, c.num_heads, c.head_dim), (0, 2, 1, 3)
            )

        q, k, v = heads("query"), heads("key"), heads("value")
        ctx = attn_ops.mha_xla(q, k, v, bias, out_dtype=dtype)
        ctx = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(b, t, c.hidden_size)
        out = nn.Dense(c.hidden_size, dtype=dtype, name="output_dense")(ctx)
        return nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=jnp.float32, name="output_norm"
        )(out + x).astype(dtype)


class BertCrossAttentionBlock(nn.Module):
    """Post-LN cross-attention sublayer with optional probability capture."""

    cfg: BertConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        kv: jax.Array,
        tap: Optional[jax.Array],
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        """x: [B, T, h] text; kv: [B, S, w] image embeds; tap: [B, H, T, S]."""
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        b, t, _ = x.shape
        s = kv.shape[1]

        q = nn.Dense(c.hidden_size, dtype=dtype, name="query")(x)
        k = nn.Dense(c.hidden_size, dtype=dtype, name="key")(kv)
        v = nn.Dense(c.hidden_size, dtype=dtype, name="value")(kv)
        q = jnp.transpose(q.reshape(b, t, c.num_heads, c.head_dim), (0, 2, 1, 3))
        k = jnp.transpose(k.reshape(b, s, c.num_heads, c.head_dim), (0, 2, 1, 3))
        v = jnp.transpose(v.reshape(b, s, c.num_heads, c.head_dim), (0, 2, 1, 3))

        probs = attn_ops.attention_probs(q, k)  # [B, H, T, S] float32
        captured = None
        if tap is not None:
            probs = probs + tap.astype(probs.dtype)
            captured = probs
        ctx = attn_ops.apply_probs(probs, v, out_dtype=dtype)
        ctx = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(b, t, c.hidden_size)
        out = nn.Dense(c.hidden_size, dtype=dtype, name="output_dense")(ctx)
        out = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=jnp.float32, name="output_norm"
        )(out + x).astype(dtype)
        return out, captured


class BertLayer(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, bias, image_embeds, tap):
        """image_embeds=None runs text-only mode (reference med.py mode="text",
        which skips the cross-attention sublayer, med.py:473-508)."""
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        x = BertSelfAttentionBlock(c, name="attention")(x, bias)
        captured = None
        if image_embeds is not None:
            x, captured = BertCrossAttentionBlock(c, name="crossattention")(
                x, image_embeds, tap
            )
        h = nn.Dense(c.intermediate_size, dtype=dtype, name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, dtype=dtype, name="output_dense")(h)
        x = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=jnp.float32, name="output_norm"
        )(h + x).astype(dtype)
        return x, captured


class _ScannedBertLayer(nn.Module):
    """lax.scan wrapper for uncaptured layer runs (carry-threaded)."""

    cfg: BertConfig

    @nn.compact
    def __call__(self, carry, _):
        x, bias, image_embeds = carry
        x, _ = BertLayer(self.cfg, name="layer")(x, bias, image_embeds, None)
        return (x, bias, image_embeds), None


class BertFusionEncoder(nn.Module):
    """Multimodal text encoder. Returns (last_hidden, captured_probs).

    ``capture_layers`` is a static tuple of 0-indexed layer numbers whose
    cross-attention probabilities are captured; ``cross_tap`` (if given) has
    shape [len(capture_layers), B, H, T, S_img] and is added to those
    probabilities. ``captured_probs`` stacks the same shape.

    Layer execution strategy (compile-time optimisation): with at most one
    captured layer the uncaptured runs before/after it execute under
    ``nn.scan`` with stacked parameters ("layers_pre"/"layers_post" groups),
    so the compiled HLO holds the layer body ~3 times instead of 12. With
    multiple captured layers (the search subsystem's 12x12 ensemble) the
    loop is unrolled with per-layer parameters ("layer_{i}").
    """

    cfg: BertConfig
    capture_layers: Tuple[int, ...] = ()

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,  # [B, T] int32
        attention_mask: jax.Array,  # [B, T] {0,1}
        image_embeds: Optional[jax.Array],  # [B, S, encoder_width] or None
        cross_tap: Optional[jax.Array] = None,
    ):
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        t = input_ids.shape[1]

        word = nn.Embed(c.vocab_size, c.hidden_size, dtype=dtype,
                        name="word_embeddings")(input_ids)
        pos = self.param(
            "position_embeddings", nn.initializers.normal(0.02),
            (c.max_position_embeddings, c.hidden_size), jnp.float32,
        )
        x = word + pos[None, :t].astype(dtype)
        x = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=jnp.float32, name="embed_norm"
        )(x).astype(dtype)

        # Additive self-attention bias, reference med.py:835,851.
        bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32))
        bias = bias * -10000.0

        def make_tap(idx):
            tap_i = None if cross_tap is None else cross_tap[idx]
            if tap_i is None:
                b = input_ids.shape[0]
                s = image_embeds.shape[1]
                tap_i = jnp.zeros((b, c.num_heads, t, s), jnp.float32)
            return tap_i

        def scan_group(x, name, length):
            if length == 0:
                return x
            group = nn.scan(
                _ScannedBertLayer,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=length,
            )(c, name=name)
            (x, _, _), _ = group((x, bias, image_embeds), None)
            return x

        # The parameter structure depends only on the static capture config,
        # so the text-only (ITC) mode reuses the multimodal tree.
        if len(self.capture_layers) <= 1:
            if self.capture_layers:
                # Layers BEFORE the capture point carry no tap gradient and
                # run as one nn.scan (small HLO). Layers AFTER it are on the
                # GradCAM backward path and stay unrolled: differentiating
                # through a scanned group made the TPU backend's compile
                # pathologically slow.
                l = self.capture_layers[0]
                x = scan_group(x, "layers_pre", l)
                tap_l = make_tap(0) if image_embeds is not None else None
                x, cap = BertLayer(c, name=f"layer_{l}")(
                    x, bias, image_embeds, tap_l
                )
                for i in range(l + 1, c.num_layers):
                    x, _ = BertLayer(c, name=f"layer_{i}")(
                        x, bias, image_embeds, None
                    )
                return x, None if cap is None else cap[None]
            x = scan_group(x, "layers_pre", c.num_layers)
            return x, None

        # Unrolled path: multi-layer (ensemble) capture.
        captured = []
        for i in range(c.num_layers):
            tap_i = None
            if image_embeds is not None and i in self.capture_layers:
                tap_i = make_tap(self.capture_layers.index(i))
            x, cap = BertLayer(c, name=f"layer_{i}")(
                x, bias, image_embeds, tap_i
            )
            if cap is not None:
                captured.append(cap)

        probs = jnp.stack(captured) if captured else None
        return x, probs
