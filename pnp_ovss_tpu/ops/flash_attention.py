"""Blockwise (flash-style) self-attention Pallas kernel for TPU.

Used for the ViT-L/16 image encoder, whose self-attention is the quadratic
cost center of the pipeline: 2305 tokens at 768px input (the reference
materialises the full [B, 16, 2305, 2305] probability tensor —
vit.py:104-106). This kernel keeps per-block tiles in VMEM and never writes
the probability matrix to HBM.

Forward-only by design: GradCAM gradients are taken with respect to a tap on
the *BERT cross-attention* probabilities (see attribution/gradcam.py), so no
backward pass ever traverses the ViT and no residuals are saved here.

Sequence lengths that are not multiples of the block size are padded by the
caller-facing wrapper; padded keys are masked with -inf inside the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 256
BLOCK_K = 256
_NEG_INF = -1e30


def supported(q: jax.Array) -> bool:
    """Whether shapes are worth/safe to run through the kernel."""
    *_, s, d = q.shape
    return d in (64, 128) and s >= 128


def _flash_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, *, kv_len_padded: int,
                  scale: float):
    """One (batch*head, q-block) program: online-softmax over k blocks.

    Refs:
      len_ref: SMEM (1,) int32 — true (unpadded) kv length.
      q_ref: [BLOCK_Q, D] VMEM
      k_ref/v_ref: [S_pad, D] VMEM (whole K/V for this batch*head)
      o_ref: [BLOCK_Q, D] VMEM
    """
    true_len = len_ref[0]
    q = q_ref[0].astype(jnp.float32) * scale

    num_k_blocks = kv_len_padded // BLOCK_K

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(kb * BLOCK_K, BLOCK_K), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * BLOCK_K, BLOCK_K), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        # Mask keys beyond the true sequence length.
        col = kb * BLOCK_K + jax.lax.broadcasted_iota(
            jnp.int32, (BLOCK_Q, BLOCK_K), dimension=1
        )
        s = jnp.where(col < true_len, s, _NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    d = q_ref.shape[-1]
    acc0 = jnp.zeros((BLOCK_Q, d), jnp.float32)
    m0 = jnp.full((BLOCK_Q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((BLOCK_Q, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, num_k_blocks, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def flash_mha(q: jax.Array, k: jax.Array, v: jax.Array, *, out_dtype=None):
    """Flash self-attention. q/k/v: [B, H, S, D] (no mask — ViT usage).

    Returns [B, H, S, D] in ``out_dtype`` (defaults to q.dtype).
    """
    out_dtype = out_dtype or q.dtype
    b, h, s, d = q.shape
    scale = 1.0 / (d**0.5)

    s_pad = -(-s // max(BLOCK_Q, BLOCK_K)) * max(BLOCK_Q, BLOCK_K)
    pad = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
    qf = jnp.pad(q, pad).reshape(b * h, s_pad, d)
    kf = jnp.pad(k, pad).reshape(b * h, s_pad, d)
    vf = jnp.pad(v, pad).reshape(b * h, s_pad, d)
    true_len = jnp.full((1,), s, jnp.int32)

    grid = (b * h, s_pad // BLOCK_Q)
    kernel = functools.partial(
        _flash_kernel, kv_len_padded=s_pad, scale=scale
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, BLOCK_Q, d), lambda bh, qb, *_: (bh, qb, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, s_pad, d), lambda bh, qb, *_: (bh, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, s_pad, d), lambda bh, qb, *_: (bh, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, BLOCK_Q, d), lambda bh, qb, *_: (bh, qb, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, s_pad, d), out_dtype),
        # Mosaic kernels only compile for TPU; CPU (tests) uses the
        # interpreter.
        interpret=jax.default_backend() == "cpu",
    )(true_len, qf, kf, vf)
    return out.reshape(b, h, s_pad, d)[:, :, :s, :]
