"""Torch (LAVIS BLIP) checkpoint -> Flax parameter converter.

Loads the BLIP-ITM state dict (e.g. model_large_retrieval_flickr.pth,
blip_itm_large.yaml:10) and maps it onto models/blip_itm.BlipITM's
parameter tree, including:

- conv patch-embed weight layout OIHW -> HWIO,
- Linear weight transposition (torch [out, in] -> flax [in, out]),
- position-embedding bicubic interpolation when the image size differs
  from the checkpoint's (reference base_model.py:86-127, vit.py:435-465),
- BERT text-encoder prefix flattening (LAVIS stores `text_encoder.bert.*`
  in some checkpoints, `text_encoder.*` in others),
- token_type embeddings are dropped: the ITM path never passes
  token_type_ids so the reference never adds them (med.py:108-115,
  BertModel.forward default None).

The checkpoint is fetched by the user (zero-egress environments cannot
download); any LAVIS/BLIP ITM .pth with matching architecture works.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

from pnp_ovss_tpu.config import ModelConfig


def _t(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def _stack_trees(trees):
    """List of identically-shaped param dicts -> one dict stacked on axis 0
    (the layout nn.scan's variable_axes={'params': 0} expects)."""
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *trees)


def convert_state_dict(
    sd: Dict[str, "object"],
    cfg: ModelConfig,
    capture_layers: tuple = (7,),
) -> Dict:
    """torch state_dict (tensors or numpy) -> flax params dict.

    ``capture_layers`` must match the BlipITM the params will be applied
    with: with <=1 captured layer the BERT layers are grouped into scanned
    stacks (layers_pre / layer_{l} / layers_post); with more they stay
    per-layer (layer_{i}). The ViT blocks are always one scanned stack.
    """
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()
          if not k.startswith("text_encoder_m")  # momentum copies
          and not k.startswith("visual_encoder_m")
          and "queue" not in k}

    # Normalise the BERT prefix: text_encoder.bert.X -> text_encoder.X
    sd = {
        re.sub(r"^text_encoder\.bert\.", "text_encoder.", k): v
        for k, v in sd.items()
    }

    p: Dict = {"visual_encoder": {}, "text_encoder": {}}

    # ---- ViT ----------------------------------------------------------
    vit = p["visual_encoder"]
    vit["patch_embed"] = {
        "kernel": sd["visual_encoder.patch_embed.proj.weight"]
        .transpose(2, 3, 1, 0),  # OIHW -> HWIO
        "bias": sd["visual_encoder.patch_embed.proj.bias"],
    }
    vit["cls_token"] = sd["visual_encoder.cls_token"]
    pos = sd["visual_encoder.pos_embed"]
    target = cfg.vit.num_patches
    if pos.shape[1] - 1 != target:
        import jax.numpy as jnp

        from pnp_ovss_tpu.models.vit import interpolate_pos_embed

        pos = np.asarray(interpolate_pos_embed(jnp.asarray(pos), target))
    vit["pos_embed"] = pos

    def dense(prefix):
        return {
            "kernel": sd[prefix + ".weight"].T,
            "bias": sd[prefix + ".bias"],
        }

    def norm(prefix):
        return {
            "scale": sd[prefix + ".weight"],
            "bias": sd[prefix + ".bias"],
        }

    def vit_block(i):
        b = f"visual_encoder.blocks.{i}"
        return {
            "norm1": norm(b + ".norm1"),
            "attn": {
                "qkv": dense(b + ".attn.qkv"),
                "proj": dense(b + ".attn.proj"),
            },
            "norm2": norm(b + ".norm2"),
            "mlp_fc1": dense(b + ".mlp.fc1"),
            "mlp_fc2": dense(b + ".mlp.fc2"),
        }

    vit["blocks"] = {
        "block": _stack_trees([vit_block(i) for i in range(cfg.vit.num_layers)])
    }
    vit["norm"] = norm("visual_encoder.norm")

    # ---- BERT fusion encoder -------------------------------------------
    te = p["text_encoder"]
    te["word_embeddings"] = {
        "embedding": sd["text_encoder.embeddings.word_embeddings.weight"]
    }
    te["position_embeddings"] = sd[
        "text_encoder.embeddings.position_embeddings.weight"
    ]
    te["embed_norm"] = norm("text_encoder.embeddings.LayerNorm")

    def bert_layer(i):
        b = f"text_encoder.encoder.layer.{i}"
        return {
            "attention": {
                "query": dense(b + ".attention.self.query"),
                "key": dense(b + ".attention.self.key"),
                "value": dense(b + ".attention.self.value"),
                "output_dense": dense(b + ".attention.output.dense"),
                "output_norm": norm(b + ".attention.output.LayerNorm"),
            },
            "crossattention": {
                "query": dense(b + ".crossattention.self.query"),
                "key": dense(b + ".crossattention.self.key"),
                "value": dense(b + ".crossattention.self.value"),
                "output_dense": dense(b + ".crossattention.output.dense"),
                "output_norm": norm(b + ".crossattention.output.LayerNorm"),
            },
            "intermediate": dense(b + ".intermediate.dense"),
            "output_dense": dense(b + ".output.dense"),
            "output_norm": norm(b + ".output.LayerNorm"),
        }

    n_layers = cfg.bert.num_layers
    if len(capture_layers) <= 1:
        if capture_layers:
            l = capture_layers[0]
            if l > 0:
                te["layers_pre"] = {
                    "layer": _stack_trees([bert_layer(i) for i in range(l)])
                }
            # Capture layer and everything after it: unrolled (on the
            # GradCAM backward path; see models/bert.py).
            for i in range(l, n_layers):
                te[f"layer_{i}"] = bert_layer(i)
        else:
            te["layers_pre"] = {
                "layer": _stack_trees(
                    [bert_layer(i) for i in range(n_layers)]
                )
            }
    else:
        for i in range(n_layers):
            te[f"layer_{i}"] = bert_layer(i)

    # ---- heads ---------------------------------------------------------
    p["itm_head"] = dense("itm_head")
    if "vision_proj.weight" in sd:
        p["vision_proj"] = dense("vision_proj")
        p["text_proj"] = dense("text_proj")

    return {"params": p}


def convert_clip_state_dict(sd: Dict[str, "object"], cfg) -> Dict:
    """OpenAI CLIP state_dict -> models/clip.CLIPModel flax params.

    Accepts the canonical OpenAI CLIP layout (ViT-L/14-336px .pt — the
    model the reference loads through LAVIS as `clip_feature_extractor
    ViT-L-14-336`, driver :1370-1372): `visual.*` vision tower with fused
    `attn.in_proj_*`, `transformer.resblocks.*` text tower,
    `token_embedding` / `positional_embedding` / `ln_final` /
    `text_projection`.
    """
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}

    def dense(prefix):
        return {"kernel": sd[prefix + ".weight"].T,
                "bias": sd[prefix + ".bias"]}

    def norm(prefix):
        return {"scale": sd[prefix + ".weight"],
                "bias": sd[prefix + ".bias"]}

    def block(prefix):
        return {
            "ln_1": norm(prefix + ".ln_1"),
            # torch MHA fuses q/k/v as in_proj [3W, W]; flax Dense kernel
            # is [W, 3W].
            "qkv": {
                "kernel": sd[prefix + ".attn.in_proj_weight"].T,
                "bias": sd[prefix + ".attn.in_proj_bias"],
            },
            "proj": dense(prefix + ".attn.out_proj"),
            "ln_2": norm(prefix + ".ln_2"),
            "c_fc": dense(prefix + ".mlp.c_fc"),
            "c_proj": dense(prefix + ".mlp.c_proj"),
        }

    def stack(prefix, n):
        return {"block": _stack_trees(
            [block(f"{prefix}.resblocks.{i}") for i in range(n)]
        )}

    v = cfg.vision
    pos = sd["visual.positional_embedding"][None]  # [1, N+1, W]
    if pos.shape[1] - 1 != v.num_patches:
        import jax.numpy as jnp

        from pnp_ovss_tpu.models.vit import interpolate_pos_embed

        pos = np.asarray(
            interpolate_pos_embed(jnp.asarray(pos), v.num_patches)
        )
    visual = {
        "patch_embed": {
            "kernel": sd["visual.conv1.weight"].transpose(2, 3, 1, 0)
        },
        "class_embedding": sd["visual.class_embedding"],
        "pos_embed": pos[0],
        "ln_pre": norm("visual.ln_pre"),
        "blocks": stack("visual.transformer", v.num_layers),
        "ln_post": norm("visual.ln_post"),
        "proj": sd["visual.proj"],
    }
    text = {
        "token_embedding": {"embedding": sd["token_embedding.weight"]},
        "pos_embed": sd["positional_embedding"],
        "blocks": stack("transformer", cfg.text.num_layers),
        "ln_final": norm("ln_final"),
        "text_projection": sd["text_projection"],
    }
    return {"params": {"visual": visual, "text": text}}


def load_clip_checkpoint(path: str, cfg) -> Dict:
    """Load an OpenAI CLIP .pt checkpoint (jit archive or state dict)."""
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    except RuntimeError:
        # OpenAI distributes ViT-L-14-336px.pt as a TorchScript archive,
        # which torch.load rejects — torch.jit.load reads it and exposes
        # the weights via state_dict().
        obj = torch.jit.load(path, map_location="cpu")
    if hasattr(obj, "state_dict"):
        sd = obj.state_dict()
    else:
        sd = obj.get("state_dict", obj.get("model", obj))
    sd = {k: v.float().numpy() if hasattr(v, "numpy") else v
          for k, v in sd.items()}
    return convert_clip_state_dict(sd, cfg)


def load_torch_checkpoint(
    path: str, cfg: ModelConfig, capture_layers: tuple = (7,)
) -> Dict:
    """Load a .pth LAVIS/BLIP checkpoint and convert (CPU torch)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return convert_state_dict(sd, cfg, capture_layers)
