"""Full-model numeric parity vs an independent torch oracle.

A minimal torch implementation of BLIP-ITM (tiny config) is built here from
scratch — ViT (pre-LN) + BERT fusion (post-LN, per-layer cross-attention) +
ITM head — sharing weights with the Flax model through the converter's
torch-layout state dict. Verifies:

1. ITM logits match to ~1e-4 (SURVEY §7 oracle requirement),
2. captured cross-attention probabilities match,
3. the full GradCAM (cam * relu(grad) * mask) matches torch hook capture.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnp_ovss_tpu.attribution.gradcam import gradcam_from_tap
from pnp_ovss_tpu.config import ModelConfig
from pnp_ovss_tpu.models.blip_itm import BlipITM
from pnp_ovss_tpu.models.convert import convert_state_dict
from tests.test_convert import _tiny_torch_state_dict

torch = pytest.importorskip("torch")


def _torch_blip_itm(sd, cfg, images_nchw, ids, mask, capture_layer):
    """Numpy/torch oracle forward with hook-style prob capture."""
    import torch.nn.functional as F

    # Weights require grad so attention probs are grad-retaining tensors
    # (mirrors the real model where hooks capture prob gradients).
    t = {k: torch.tensor(v, requires_grad=True) for k, v in sd.items()}
    v = cfg.vit
    B = images_nchw.shape[0]

    def lin(x, name):
        return x @ t[name + ".weight"].T + t[name + ".bias"]

    def ln(x, name, eps):
        mu = x.mean(-1, keepdim=True)
        var = x.var(-1, unbiased=False, keepdim=True)
        return (x - mu) / torch.sqrt(var + eps) * t[name + ".weight"] + t[
            name + ".bias"
        ]

    # --- ViT ---
    x = F.conv2d(
        images_nchw, t["visual_encoder.patch_embed.proj.weight"],
        t["visual_encoder.patch_embed.proj.bias"], stride=v.patch_size,
    )
    x = x.flatten(2).transpose(1, 2)  # [B, P, C]
    cls = t["visual_encoder.cls_token"].expand(B, -1, -1)
    x = torch.cat([cls, x], dim=1) + t["visual_encoder.pos_embed"]
    for i in range(v.num_layers):
        b = f"visual_encoder.blocks.{i}"
        h = ln(x, b + ".norm1", 1e-6)
        qkv = lin(h, b + ".attn.qkv").reshape(
            B, -1, 3, v.num_heads, v.head_dim
        ).permute(2, 0, 3, 1, 4)
        q, k, vv = qkv[0], qkv[1], qkv[2]
        att = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(v.head_dim), -1)
        h2 = (att @ vv).transpose(1, 2).reshape(B, -1, v.hidden_size)
        x = x + lin(h2, b + ".attn.proj")
        h = ln(x, b + ".norm2", 1e-6)
        h = lin(h, b + ".mlp.fc1")
        h = F.gelu(h)
        x = x + lin(h, b + ".mlp.fc2")
    image_embeds = ln(x, "visual_encoder.norm", 1e-6)

    # --- BERT fusion ---
    c = cfg.bert
    emb = t["text_encoder.embeddings.word_embeddings.weight"][ids]
    pos = t["text_encoder.embeddings.position_embeddings.weight"][
        : ids.shape[1]
    ]
    h = ln(emb + pos, "text_encoder.embeddings.LayerNorm", c.layer_norm_eps)
    bias = (1.0 - mask[:, None, None, :].float()) * -10000.0

    captured = {}

    def mha(xq, xkv, prefix, bias_, capture=False):
        tq = lin(xq, prefix + ".self.query").reshape(
            B, -1, c.num_heads, c.head_dim
        ).transpose(1, 2)
        tk = lin(xkv, prefix + ".self.key").reshape(
            B, -1, c.num_heads, c.head_dim
        ).transpose(1, 2)
        tv = lin(xkv, prefix + ".self.value").reshape(
            B, -1, c.num_heads, c.head_dim
        ).transpose(1, 2)
        scores = tq @ tk.transpose(-1, -2) / math.sqrt(c.head_dim)
        if bias_ is not None:
            scores = scores + bias_
        probs = torch.softmax(scores, -1)
        if capture:
            probs.retain_grad()
            captured["probs"] = probs
        ctx = (probs @ tv).transpose(1, 2).reshape(B, -1, c.hidden_size)
        out = lin(ctx, prefix + ".output.dense")
        return ln(out + xq, prefix + ".output.LayerNorm", c.layer_norm_eps)

    for i in range(c.num_layers):
        b = f"text_encoder.encoder.layer.{i}"
        h = mha(h, h, b + ".attention", bias)
        h = mha(h, image_embeds, b + ".crossattention", None,
                capture=(i == capture_layer))
        ff = lin(h, b + ".intermediate.dense")
        ff = F.gelu(ff)
        h = ln(lin(ff, b + ".output.dense") + h,
               b + ".output.LayerNorm", c.layer_norm_eps)

    logits = lin(h[:, 0], "itm_head")
    return logits, captured


def test_full_model_and_gradcam_match_torch_oracle():
    cfg = ModelConfig.tiny()
    rng = np.random.RandomState(5)
    sd = _tiny_torch_state_dict(cfg, rng)
    capture_layer = 0

    B = 2
    images = rng.randn(B, cfg.vit.image_size, cfg.vit.image_size, 3).astype(
        np.float32
    )
    ids = np.zeros((B, cfg.max_text_len), np.int64)
    mask = np.zeros((B, cfg.max_text_len), np.int64)
    ids[:, :7] = rng.randint(5, 60, (B, 7))
    mask[:, :7] = 1

    # --- torch oracle with backward ---
    ids_t = torch.tensor(ids)
    mask_t = torch.tensor(mask)
    img_t = torch.tensor(images.transpose(0, 3, 1, 2))
    logits_t, captured = _torch_blip_itm(
        sd, cfg, img_t, ids_t, mask_t, capture_layer
    )
    logits_t[:, 1].sum().backward()
    cam_t = captured["probs"].detach().numpy()
    grad_t = captured["probs"].grad.numpy()
    g = cfg.vit.grid
    gc_t = (
        cam_t[:, :, :, 1:] * np.clip(grad_t[:, :, :, 1:], 0, None)
        * mask[:, None, :, None]
    ).reshape(B, cfg.bert.num_heads, cfg.max_text_len, g, g)[:, :, 1:]

    # --- flax ---
    params = convert_state_dict(sd, cfg, capture_layers=(capture_layer,))
    model = BlipITM(cfg, capture_layers=(capture_layer,), attn_impl="xla")

    def apply_fn(p, im, i, m, cross_tap):
        return model.apply(p, im, i, m, cross_tap=cross_tap)

    gc_j, logits_j = jax.jit(
        lambda im, i, m: gradcam_from_tap(
            apply_fn, params, im, i, m,
            num_capture_layers=1, num_heads=cfg.bert.num_heads,
            num_image_tokens=cfg.vit.seq_len, grid=g,
        )
    )(jnp.asarray(images), jnp.asarray(ids, jnp.int32),
      jnp.asarray(mask, jnp.int32))

    np.testing.assert_allclose(
        np.asarray(logits_j), logits_t.detach().numpy(), rtol=2e-4, atol=2e-4
    )
    # gc_j: [1, B, H, T-1, g, g]; transpose oracle to head-major.
    gc_torch = np.transpose(gc_t, (0, 1, 2, 3, 4))
    np.testing.assert_allclose(
        np.asarray(gc_j)[0], gc_torch, rtol=5e-3, atol=1e-5
    )
