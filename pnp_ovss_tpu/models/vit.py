"""Flax ViT image encoder (BLIP's ViT-L/16).

Topology matches the reference `Files to replace for BLIP/vit.py`:
- conv patch embed (patch 16), prepended CLS token, learned absolute
  position embeddings (vit.py:220-231, :274-296),
- pre-LayerNorm blocks: x += attn(LN(x)); x += mlp(LN(x)) (vit.py:163-168),
- GELU MLP with ratio 4, final LayerNorm (vit.py:255, :285-294),
- ViT-L: depth 24, width 1024, 16 heads (vit.py:511-523).

TPU-native differences from the reference (deliberate):
- NHWC image layout (XLA-preferred on TPU) instead of NCHW,
- bfloat16 compute with float32 LayerNorm/softmax,
- self-attention runs through the flash kernel (ops/flash_attention.py)
  instead of materialising [B, H, S, S] probabilities (vit.py:104-113);
  attention-capture hooks are not ported because the ITM GradCAM path never
  reads ViT attention (reference calls forward_features with
  register_blk=-1, vit.py:535-536),
- on the pallas path the whole encode runs at the flash kernel's padded
  sequence length (443 -> 512 once, instead of pad/slice around every
  layer's attention) and each block's LayerNorms ride inside fused Pallas
  matmul kernels (ops/vit_block_pallas.py): LN1+qkv as one kernel,
  LN2+fc1+gelu+fc2+residual as one kernel — the [M, 4096] MLP activation
  never touches HBM. Padded rows carry finite garbage that no real row
  ever reads (attention masks keys >= true_len; everything else is
  row-local); the final slice drops them.
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp

from pnp_ovss_tpu.config import ViTConfig
from pnp_ovss_tpu.ops import attention as attn_ops
from pnp_ovss_tpu.ops import flash_attention as _flash
from pnp_ovss_tpu.ops import vit_block_pallas as _vbp


def make_patch_conv(cfg: ViTConfig) -> nn.Conv:
    """The patch-embedding conv, identically configured everywhere.

    Single source of truth for VisionTransformer and the pipeline-parallel
    encode (parallel/pipeline.py), so the stem cannot silently diverge
    between the sharded and unsharded paths.
    """
    return nn.Conv(
        cfg.hidden_size,
        kernel_size=(cfg.patch_size, cfg.patch_size),
        strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dtype=jnp.dtype(cfg.dtype),
        name="patch_embed",
    )


def stem_from_patches(
    cfg: ViTConfig, patches: jax.Array, cls_token: jax.Array,
    pos_embed: jax.Array,
) -> jax.Array:
    """Patch-conv output -> token sequence: reshape + CLS + pos embed.

    Mirrors the reference stem (vit.py:220-231, :274-296); shared by
    VisionTransformer.__call__ and encode_images_pp's replicated stem.
    """
    dtype = jnp.dtype(cfg.dtype)
    b = patches.shape[0]
    x = patches.reshape(b, cfg.num_patches, cfg.hidden_size)
    x = jnp.concatenate(
        [jnp.broadcast_to(cls_token.astype(dtype), (b, 1, cfg.hidden_size)),
         x],
        axis=1,
    )
    return x + pos_embed.astype(dtype)


def fused_path_supported(cfg: ViTConfig, impl: str) -> bool:
    """True iff the fused-kernel encode (LN+matmul Pallas blocks + flat
    flash attention) handles this config. Single predicate shared by the
    unsharded, sequence-parallel and pipeline-parallel encodes."""
    return (
        impl == "pallas"
        and os.environ.get("PNP_VIT_FUSED", "1") not in ("0", "false")
        and _flash.flat_supported(cfg.seq_len, cfg.num_heads, cfg.head_dim)
        and _vbp.supported(cfg.hidden_size, 3 * cfg.hidden_size,
                           mlp_hidden=int(cfg.hidden_size * cfg.mlp_ratio))
    )


def fused_seq_pad(seq_len: int, sp: int = 1) -> int:
    """Whole-encode padded sequence length on the fused path (one pad to
    the flash kernel's canonical tight k-schedule — 443 -> 448, 2305 ->
    2320 — instead of per-layer pad/slice). With ``sp`` > 1 the carried
    pad is rounded up to a multiple of 16*sp so the token axis chunks
    into 16-sublane-aligned per-device slices; the attention kernels
    re-canonicalise K/V on the TRUE length internally, so a larger
    carried pad never changes the numerics."""
    block, nb = _flash.seq_blocks(seq_len)
    s_pad = block * nb
    if sp > 1:
        s_pad = -(-s_pad // (16 * sp)) * (16 * sp)
    return s_pad


class ViTSelfAttention(nn.Module):
    """Self-attention; ``sp_axis`` switches to the sequence-parallel form.

    Sequence parallelism (absent from the reference — SURVEY §5 records
    "no ring attention, no context parallel, no blockwise attention
    anywhere"): under ``jax.shard_map`` with the token axis sharded over
    ``sp_axis``, x is the LOCAL contiguous chunk of query rows. K/V are
    all-gathered across the axis once per layer (at ViT-L 768px that is a
    [B, S, 2*H*D] bf16 gather riding ICI) and every query attends over
    the full sequence — per-row math identical to the unsharded encode.
    ``kv_true_len`` masks gathered keys beyond the real sequence.
    """

    cfg: ViTConfig
    impl: str = "pallas"
    sp_axis: "str | None" = None
    kv_true_len: "int | None" = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        b, s, _ = x.shape
        qkv = nn.Dense(3 * c.hidden_size, dtype=dtype, name="qkv")(x)
        if self.sp_axis is not None:
            hd = c.hidden_size
            sp = jax.lax.axis_size(self.sp_axis)
            skv = s * sp
            true_len = self.kv_true_len if self.kv_true_len is not None \
                else skv
            kv = jax.lax.all_gather(
                qkv[..., hd:], self.sp_axis, axis=1, tiled=True
            )  # [B, Skv, 2*H*D], chunk order == token order
            if self.impl == "pallas" and _flash.xlen_supported(
                s, skv, c.num_heads, c.head_dim
            ):
                out = _flash.flash_mha_flat_xlen(
                    qkv[..., :hd], kv[..., :hd], kv[..., hd:],
                    num_heads=c.num_heads, out_dtype=dtype,
                    true_kv_len=true_len,
                )
                return nn.Dense(c.hidden_size, dtype=dtype, name="proj")(out)
            # XLA fallback (tiny/odd shapes): BHSD attention with a key
            # mask. Masked keys get exp(-1e30-max) == 0 weight, and the
            # extra zero products append exact-0 terms to the contraction
            # — outputs match the unsharded encode bit-for-bit.
            q = jnp.transpose(
                qkv[..., :hd].reshape(b, s, c.num_heads, c.head_dim),
                (0, 2, 1, 3))
            k = jnp.transpose(
                kv[..., :hd].reshape(b, skv, c.num_heads, c.head_dim),
                (0, 2, 1, 3))
            v = jnp.transpose(
                kv[..., hd:].reshape(b, skv, c.num_heads, c.head_dim),
                (0, 2, 1, 3))
            bias = jnp.where(
                jnp.arange(skv)[None, None, None, :] < true_len, 0.0, -1e30
            ).astype(jnp.float32)
            out = attn_ops.mha_xla(q, k, v, bias, out_dtype=dtype)
            out = jnp.transpose(out, (0, 2, 1, 3)).reshape(
                b, s, c.hidden_size)
            return nn.Dense(c.hidden_size, dtype=dtype, name="proj")(out)
        if self.impl == "pallas" and _flash.flat_supported(
            s, c.num_heads, c.head_dim
        ):
            # Fused flat-layout kernel: q/k/v are plain channel slices of
            # the qkv output ([B, S, H*D]; head-major within, matching the
            # [B, S, 3, H, D] reshape below) and the result feeds proj
            # directly — zero relayouts. At 336px the attention matmuls
            # are sub-ms; the blockwise kernel's cost was program count +
            # the six per-layer transposes (NOTES round-2 bisect).
            out = _flash.flash_mha_from_qkv(
                qkv, num_heads=c.num_heads, out_dtype=dtype,
            )
            return nn.Dense(c.hidden_size, dtype=dtype, name="proj")(out)
        qkv = qkv.reshape(b, s, 3, c.num_heads, c.head_dim)
        q, k, v = (
            jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3)
        )
        out = attn_ops.mha(q, k, v, impl=self.impl, out_dtype=dtype)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, s, c.hidden_size)
        return nn.Dense(c.hidden_size, dtype=dtype, name="proj")(out)


class ViTBlock(nn.Module):
    cfg: ViTConfig
    impl: str = "pallas"
    sp_axis: "str | None" = None
    kv_true_len: "int | None" = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         name="norm1")(x).astype(dtype)
        x = x + ViTSelfAttention(c, impl=self.impl, sp_axis=self.sp_axis,
                                 kv_true_len=self.kv_true_len,
                                 name="attn")(h)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         name="norm2")(x).astype(dtype)
        h = nn.Dense(int(c.hidden_size * c.mlp_ratio), dtype=dtype,
                     name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, dtype=dtype, name="mlp_fc2")(h)
        return x + h


class _DenseParams(nn.Module):
    """Declares nn.Dense-compatible params without computing anything
    (the fused kernels consume the raw kernel/bias)."""

    fin: int
    fout: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.fin, self.fout), jnp.float32)
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.fout,), jnp.float32)
        return k, b


class _NormParams(nn.Module):
    """nn.LayerNorm-compatible scale/bias params."""

    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones_init(),
                       (self.dim,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.dim,), jnp.float32)
        return s, b


class _FusedAttnParams(nn.Module):
    """qkv/proj param container matching ViTSelfAttention's tree."""

    d: int

    @nn.compact
    def __call__(self):
        qkv = _DenseParams(self.d, 3 * self.d, name="qkv")()
        proj = _DenseParams(self.d, self.d, name="proj")()
        return qkv, proj


class ViTBlockFused(nn.Module):
    """Pre-LN block on the fused-kernel path: LN1+qkv in one Pallas
    matmul kernel, flat flash attention, XLA proj+residual, then
    LN2+MLP+residual in one Pallas kernel. Parameter tree is identical
    to ViTBlock (the converter and partition specs see no difference).

    The carried x may be row-padded (whole-encode S_pad layout);
    ``true_len`` masks attention keys beyond the real sequence.
    """

    cfg: ViTConfig
    true_len: int
    sp_axis: "str | None" = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        b, s, d = x.shape
        m = b * s
        (qkv_k, qkv_b), (proj_k, proj_b) = _FusedAttnParams(
            d, name="attn")()
        g1, b1 = _NormParams(d, name="norm1")()
        g2, b2 = _NormParams(d, name="norm2")()
        w1, fb1 = _DenseParams(d, int(d * c.mlp_ratio), name="mlp_fc1")()
        w2, fb2 = _DenseParams(int(d * c.mlp_ratio), d, name="mlp_fc2")()

        qkv = _vbp.ln_matmul(
            x.reshape(m, d), g1, b1,
            qkv_k.astype(dtype), qkv_b.astype(dtype),
            eps=c.layer_norm_eps, out_dtype=dtype,
        ).reshape(b, s, 3 * d)
        if self.sp_axis is not None:
            # Sequence-parallel: x is the local token chunk; gather the
            # full K/V across the axis (the q slice stays local). Same
            # k-block schedule as the equal-length kernel, so per-row
            # outputs match the unsharded encode bit-for-bit.
            kv = jax.lax.all_gather(
                qkv[..., d:], self.sp_axis, axis=1, tiled=True
            )
            out = _flash.flash_mha_flat_xlen(
                qkv[..., :d], kv[..., :d], kv[..., d:],
                num_heads=c.num_heads, out_dtype=dtype,
                true_kv_len=self.true_len,
            )
        elif _flash.proj_fold_enabled(self.true_len):
            # Attention + proj + residual in ONE kernel: the attention
            # output never touches HBM and there is no XLA matmul between
            # the Pallas calls (the whole block is 3 kernels).
            x = _flash.flash_mha_qkv_proj(
                qkv, x, proj_k.astype(dtype), proj_b.astype(dtype),
                num_heads=c.num_heads, out_dtype=dtype,
                true_len=self.true_len,
            )
            return _vbp.ln_mlp_residual(
                x.reshape(m, d), g2, b2,
                w1.astype(dtype), fb1.astype(dtype),
                w2.astype(dtype), fb2.astype(dtype),
                eps=c.layer_norm_eps, out_dtype=dtype,
            ).reshape(b, s, d)
        else:
            # q/k/v are BlockSpec views into the qkv output — XLA would
            # materialise each strided channel slice as a full copy before
            # the pallas custom call (~2x qkv-sized HBM traffic per layer).
            out = _flash.flash_mha_from_qkv(
                qkv, num_heads=c.num_heads, out_dtype=dtype,
                true_len=self.true_len,
            )
        # proj + residual: a plain bf16 matmul XLA already runs at full
        # MXU rate and fuses the residual add into (bisect: residuals
        # measured ~free).
        x = x + (jnp.dot(out, proj_k.astype(dtype))
                 + proj_b.astype(dtype))
        return _vbp.ln_mlp_residual(
            x.reshape(m, d), g2, b2,
            w1.astype(dtype), fb1.astype(dtype),
            w2.astype(dtype), fb2.astype(dtype),
            eps=c.layer_norm_eps, out_dtype=dtype,
        ).reshape(b, s, d)


class _ScannedBlockFused(nn.Module):
    """lax.scan wrapper for the fused block (same param tree names)."""

    cfg: ViTConfig
    true_len: int
    sp_axis: "str | None" = None

    @nn.compact
    def __call__(self, x, _):
        return ViTBlockFused(self.cfg, self.true_len,
                             sp_axis=self.sp_axis, name="block")(x), None


class _ScannedBlock(nn.Module):
    """lax.scan-compatible wrapper: (carry, None) -> (carry, None)."""

    cfg: ViTConfig
    impl: str
    sp_axis: "str | None" = None
    kv_true_len: "int | None" = None

    @nn.compact
    def __call__(self, x, _):
        return ViTBlock(self.cfg, impl=self.impl, sp_axis=self.sp_axis,
                        kv_true_len=self.kv_true_len, name="block")(x), None


class VisionTransformer(nn.Module):
    """Returns patch-token embeddings [B, 1 + P*P, hidden] (CLS first).

    The 24 blocks run under one ``nn.scan`` with stacked parameters
    (leading [num_layers] axis) so the compiled HLO contains the block
    body once — compile time on TPU is ~num_layers times smaller than the
    reference's unrolled module list (vit.py:236-255).
    """

    cfg: ViTConfig
    impl: str = "pallas"
    # Sequence parallelism (TPU-native extension; the reference has no
    # long-context strategy at all — SURVEY §5). Set to a mesh axis name
    # and apply the module INSIDE jax.shard_map with images sharded on
    # the data axis and params replicated (parallel/sequence.py wraps
    # this): the token axis is split into contiguous per-device chunks
    # after the (cheap, replicated-within-sp-group) patch embed, every
    # block's LN/qkv/proj/MLP run on local rows only, attention gathers
    # K/V across the axis, and the chunks are re-gathered at the end.
    # Output is identical to the unsharded encode.
    sp_axis: "str | None" = None

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """images: [B, H, W, 3] float (already CLIP-normalised, NHWC)."""
        c = self.cfg
        dtype = jnp.dtype(c.dtype)

        patches = make_patch_conv(c)(images.astype(dtype))
        cls_token = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02),
            (1, 1, c.hidden_size), jnp.float32,
        )
        pos_embed = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (1, c.seq_len, c.hidden_size), jnp.float32,
        )
        x = stem_from_patches(c, patches, cls_token, pos_embed)

        use_fused = fused_path_supported(c, self.impl)
        sp = 1
        if self.sp_axis is not None:
            sp = jax.lax.axis_size(self.sp_axis)  # static under shard_map

        if use_fused:
            # Whole-encode padded layout: pad ONCE to the flash kernel's
            # k-block multiple instead of pad/slice around every layer's
            # attention; the fused block kernels then tile rows with no
            # per-call padding either. Padded rows hold finite garbage
            # no real row reads (keys >= true_len are masked).
            s_pad = fused_seq_pad(c.seq_len, sp)
            x = jnp.pad(x, ((0, 0), (0, s_pad - c.seq_len), (0, 0)))
            if sp > 1:
                x = jax.lax.dynamic_slice_in_dim(
                    x, jax.lax.axis_index(self.sp_axis) * (s_pad // sp),
                    s_pad // sp, 1)
            blocks = nn.scan(
                _ScannedBlockFused,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=c.num_layers,
            )(c, c.seq_len, sp_axis=self.sp_axis if sp > 1 else None,
              name="blocks")
            x, _ = blocks(x, None)
            if sp > 1:
                x = jax.lax.all_gather(x, self.sp_axis, axis=1, tiled=True)
            x = x[:, :c.seq_len]
        else:
            if sp > 1:
                # Pad to an sp-divisible token count; padded keys are
                # masked inside the sequence-parallel attention, so the
                # real rows match the unsharded encode exactly.
                s_pad = -(-c.seq_len // sp) * sp
                x = jnp.pad(x, ((0, 0), (0, s_pad - c.seq_len), (0, 0)))
                x = jax.lax.dynamic_slice_in_dim(
                    x, jax.lax.axis_index(self.sp_axis) * (s_pad // sp),
                    s_pad // sp, 1)
            blocks = nn.scan(
                _ScannedBlock,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=c.num_layers,
            )(c, self.impl, sp_axis=self.sp_axis if sp > 1 else None,
              kv_true_len=c.seq_len, name="blocks")
            x, _ = blocks(x, None)
            if sp > 1:
                x = jax.lax.all_gather(x, self.sp_axis, axis=1, tiled=True)
                x = x[:, :c.seq_len]

        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         name="norm")(x)
        return x.astype(dtype)


def interpolate_pos_embed(
    pos_embed: jax.Array, target_num_patches: int
) -> jax.Array:
    """Bicubic-resample grid position embeddings to a new patch count.

    Mirrors the semantics of the reference's checkpoint loader
    (vit.py:435-465, base_model.py:86-127): the CLS entry is preserved and
    the [g, g] grid entries are 2D-resized to the new grid.
    """
    _, n, dim = pos_embed.shape
    num_extra = 1  # CLS
    orig_grid = int((n - num_extra) ** 0.5)
    new_grid = int(target_num_patches**0.5)
    if orig_grid == new_grid:
        return pos_embed
    extra = pos_embed[:, :num_extra]
    grid = pos_embed[:, num_extra:].reshape(1, orig_grid, orig_grid, dim)
    grid = jax.image.resize(
        grid, (1, new_grid, new_grid, dim), method="bicubic"
    )
    grid = grid.reshape(1, new_grid * new_grid, dim)
    return jnp.concatenate([extra, grid], axis=1)
