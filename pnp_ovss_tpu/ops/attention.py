"""Multi-head attention ops.

Two implementations behind one interface:

- ``xla``: einsum-based attention. XLA fuses the softmax chain well and maps
  the two batched matmuls onto the MXU; this is the correctness reference.
- ``pallas``: blockwise (flash-style) kernel that never materialises the
  [S, S] probability matrix — used for the ViT self-attention where S grows
  quadratically with image size (2305 tokens at 768px; reference
  vit.py:105 comment shows the [B, 16, 2305, 2305] tensor it materialises).

The BERT *cross*-attention of the selected GradCAM layer must materialise its
probabilities (they are the attribution signal — reference med.py:280-283
captures them via torch hooks), so it always uses the xla path with the
probabilities returned explicitly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pnp_ovss_tpu.ops import flash_attention as _flash


def attention_probs(
    q: jax.Array,
    k: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    softmax_dtype=jnp.float32,
) -> jax.Array:
    """Scaled dot-product attention probabilities.

    Args:
      q: [B, H, Tq, D]
      k: [B, H, Tk, D]
      bias: optional additive bias broadcastable to [B, H, Tq, Tk]
        (the reference uses ``(1 - mask) * -10000`` — med.py:851).

    Returns:
      probs: [B, H, Tq, Tk] in ``softmax_dtype``.
    """
    d = q.shape[-1]
    scale = 1.0 / (d**0.5)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=softmax_dtype
    )
    scores = scores * scale
    if bias is not None:
        scores = scores + bias.astype(softmax_dtype)
    return jax.nn.softmax(scores, axis=-1)


def mha_xla(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    out_dtype=None,
) -> jax.Array:
    """Plain attention: softmax(qk/sqrt(d) + bias) @ v. Shapes [B, H, T, D]."""
    probs = attention_probs(q, k, bias)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs, v.astype(probs.dtype),
        preferred_element_type=jnp.float32,
    )
    return out.astype(out_dtype or q.dtype)


def apply_probs(probs: jax.Array, v: jax.Array, *, out_dtype=None) -> jax.Array:
    """Context = probs @ v, split out so a gradient tap can sit on ``probs``."""
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs, v.astype(probs.dtype),
        preferred_element_type=jnp.float32,
    )
    return out.astype(out_dtype or v.dtype)


def mha(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    impl: str = "xla",
    out_dtype=None,
) -> jax.Array:
    """Dispatching MHA entry point. ``impl`` in {"xla", "pallas"}."""
    if impl == "pallas":
        if bias is None and _flash.supported(q):
            return _flash.flash_mha(q, k, v, out_dtype=out_dtype)
        # Fall through for unsupported shapes (e.g. tiny test configs).
    return mha_xla(q, k, v, bias, out_dtype=out_dtype)
