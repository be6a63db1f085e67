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
import os

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


# ---------------------------------------------------------------------------
# Fused flat-layout kernel (moderate sequence lengths)
# ---------------------------------------------------------------------------
#
# At 336px the ViT sequence is 443 tokens (padded 512) with dh=64: the
# attention matmuls are ~0.5 ms of MXU work for the whole 24-layer encode,
# yet attention measured ~68 ms — the cost is per-program overhead (the
# blockwise kernel launches B*H*(S/BLOCK_Q) programs per layer) plus the six
# [B, S, H, D] <-> [B, H, S, D] relayouts per layer around it (round-2
# bisect, NOTES "Attribution perf investigation").
#
# This kernel removes both:
# - q/k/v stay in the qkv Dense's own layout — three [B, S, H*D] slices,
#   no transposes in or out; heads are LANE slices (d=64-aligned) inside
#   the kernel,
# - one program per (batch, head-group, q-block) computes
#   HEADS_PER_PROGRAM heads with an online-softmax loop over 512-wide k
#   blocks; at 336px (S_pad 512) that is ONE whole-sequence block and 4x
#   fewer programs than the old blockwise grid (hb=2; measured
#   33.5 -> 38.8 img/s end-to-end, while hb=4 regressed to 31.8 —
#   per-program VMEM working set beats further program-count reduction).
#   At 768px (2305 tokens -> S_pad 2560) the same kernel streams k blocks
#   with K/V held whole per head group (1.3 MB VMEM).

HEADS_PER_PROGRAM = 2
_FLAT_BLOCK_Q = 512
_FLAT_BLOCK_K = 512


def seq_blocks(true_len: int) -> "tuple[int, int]":
    """Canonical (block_k, num_blocks) k-schedule for a sequence.

    Tight padding: the padded length block_k * num_blocks is the smallest
    16-sublane multiple that splits into equal k blocks <= 512. The ViT's
    443 real tokens pad to 448 (one block) instead of 512, and 768px's
    2305 tokens to 2320 (5 x 464) instead of 2560 — at 336px that is
    12.5% of every dense-matmul row and ~23% of the attention score
    work (the MXU pads score lanes to 128 in-register either way, but
    rows are real passes and the exp/sum VPU work scales with area).

    The schedule is keyed on the TRUE length, never on however the
    caller padded its arrays: every entry point slices/pads to the
    canonical length internally, so the unsharded, sequence-parallel and
    pipeline-parallel encodes all visit identical k blocks and stay
    bit-identical regardless of their carried padding.

    ``PNP_FLASH_TIGHT=0`` restores the legacy 512-multiple padding for
    end-to-end A/B runs.
    """
    if os.environ.get("PNP_FLASH_TIGHT", "1") in ("0", "false"):
        nb = max(1, -(-true_len // _FLAT_BLOCK_K))
        return _FLAT_BLOCK_K, nb
    s16 = -(-true_len // 16) * 16
    nb = max(1, -(-s16 // _FLAT_BLOCK_K))
    block = -(-true_len // (16 * nb)) * 16
    return block, nb


def _pick_batch_group(b: int, s_pad: int, hd_block: int = 128) -> int:
    """Batch-group size: fold several batch elements into one program when
    the k loop is a single whole-sequence block (short-sequence regime
    where per-program overhead, not compute, dominates — the round-2
    bisect measured ~2us x 6720 programs ~= 13 ms of the 336px encode).
    Long sequences keep bb=1 (K/V VMEM footprint grows with S_pad).

    Bigger groups keep winning while the working set fits VMEM: the
    round-5 TPU A/B at B=35 / s_pad 448 measured bb=7 at 63.8 img/s
    end-to-end vs bb=5 (the old auto) at 61.1 and bb=1 at 49.9. So take
    the LARGEST divisor of ``b`` (capped at 8 — the bb x hb head loop is
    statically unrolled) whose double-buffered q/k/v/o block estimate
    stays strictly under 7 MB. The cap is CALIBRATED against the
    measured scoped limit, not derived: bb=8 at s_pad 448 / hd_block 128
    (estimate exactly 7 MB) compiles to a 16.29 MB scoped-VMEM stack —
    300 KB over the
    16 MB hardware limit (Mosaic's f32 score/prob transients add ~2.2x
    the io-block estimate) — while bb=7 (estimate 6.42 MB) fits. 7 MB
    encodes that boundary. PNP_FLASH_BB forces a value (1 disables
    grouping) for A/B runs."""
    env = os.environ.get("PNP_FLASH_BB")
    if env:
        forced = int(env)
        return forced if forced > 0 and b % forced == 0 else 1
    if s_pad > _FLAT_BLOCK_K:
        return 1
    bq = min(_FLAT_BLOCK_Q, s_pad)
    for cand in range(min(b, 8), 1, -1):
        # 2 (double-buffer) x bb x (q + k + v + o blocks) x 2 bytes
        est = 2 * cand * (2 * bq + 2 * s_pad) * hd_block * 2
        if b % cand == 0 and est < 7 * 1024 * 1024:
            return cand
    return 1


def _flat_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, *, hb: int, d: int,
                 scale: float, bb: int = 1, block_k: int = _FLAT_BLOCK_K):
    """One (batch-group, head-group, q-block) program: attention for
    bb batches x hb heads over the q block, online-softmax over k blocks.

    Refs:
      len_ref: SMEM (1,) int32 — true (unpadded) sequence length.
      q_ref/o_ref: [bb, BQ, hb*D] VMEM (flat head-group slices)
      k_ref/v_ref: [bb, S_pad, hb*D] VMEM (whole K/V for this head group)

    At 336px (S_pad 512) the k loop runs ONCE — whole-sequence attention
    per program; at 768px (S_pad 2560) it streams 512-wide k blocks with
    the usual running max/denominator. ``bb`` batches share one program
    to amortise per-program DMA-issue overhead (the attention matmuls
    themselves are sub-ms for the whole encode).
    """
    true_len = len_ref[0]
    bq = q_ref.shape[1]
    s_pad = k_ref.shape[1]
    num_kb = s_pad // block_k
    neg = jnp.float32(_NEG_INF)
    for bi in range(bb):  # static unroll over the batch group
        for i in range(hb):  # static unroll: head slices are lane-aligned
            q = q_ref[bi, :, i * d:(i + 1) * d].astype(jnp.float32) * scale

            def kb_body(kb, carry):
                acc, m_prev, l_prev = carry
                k = k_ref[bi, pl.ds(kb * block_k, block_k),
                          i * d:(i + 1) * d].astype(jnp.float32)
                v = v_ref[bi, pl.ds(kb * block_k, block_k),
                          i * d:(i + 1) * d].astype(jnp.float32)
                s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
                col = kb * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (bq, block_k), dimension=1
                )
                s = jnp.where(col < true_len, s, neg)
                m_cur = jnp.max(s, axis=-1, keepdims=True)
                m_new = jnp.maximum(m_prev, m_cur)
                p = jnp.exp(s - m_new)
                alpha = jnp.exp(m_prev - m_new)
                l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
                acc = acc * alpha + jnp.dot(
                    p, v, preferred_element_type=jnp.float32
                )
                return acc, m_new, l_new

            acc0 = jnp.zeros((bq, d), jnp.float32)
            m0 = jnp.full((bq, 1), neg, jnp.float32)
            l0 = jnp.zeros((bq, 1), jnp.float32)
            if num_kb == 1:
                acc, _, l = kb_body(0, (acc0, m0, l0))
            else:
                acc, _, l = jax.lax.fori_loop(
                    0, num_kb, kb_body, (acc0, m0, l0))
            o_ref[bi, :, i * d:(i + 1) * d] = (acc / l).astype(o_ref.dtype)


def _fit_rows(x: jax.Array, target: int) -> jax.Array:
    """Pad or slice the token axis (axis 1) to ``target`` rows.

    Entry points canonicalise however-the-caller-padded arrays to the
    ``seq_blocks`` schedule: sliced-away rows are beyond the canonical
    pad (garbage no real row reads), added rows are zeros that the key
    mask hides. Output rows sliced off are re-padded with zeros — also
    garbage rows by contract."""
    s = x.shape[1]
    if s < target:
        return jnp.pad(x, [(0, 0), (0, target - s), (0, 0)])
    if s > target:
        return x[:, :target]
    return x


def flat_supported(s: int, h: int, d: int) -> bool:
    return (
        d in (64, 128)
        and s >= 128
        and h % HEADS_PER_PROGRAM == 0
        # Mosaic block lanes must be a multiple of 128 (hb=1 x d=64 is
        # rejected by the lowering; hb=2 measured fastest end-to-end:
        # 33.5 -> 38.8 img/s vs hb=4's 31.8).
        and (HEADS_PER_PROGRAM * d) % 128 == 0
    )


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "out_dtype", "true_len"))
def flash_mha_flat(q2: jax.Array, k2: jax.Array, v2: jax.Array, *,
                   num_heads: int, out_dtype=None,
                   true_len: "int | None" = None):
    """Fused attention on flat [B, S, H*D] q/k/v (no head transposes).

    Returns [B, S, H*D] in ``out_dtype`` (defaults to q2.dtype) — feed it
    straight into the output projection. ``true_len`` masks keys beyond
    that position when the caller already carries a padded sequence
    (the whole-encode S_pad layout): keys >= true_len get -inf scores,
    so padded rows never contaminate real queries.
    """
    out_dtype = out_dtype or q2.dtype
    b, s, hd = q2.shape
    h = num_heads
    d = hd // h
    scale = 1.0 / (d**0.5)
    hb = HEADS_PER_PROGRAM

    # Canonical tight k-schedule keyed on the TRUE length (seq_blocks):
    # at 336px (443 real tokens) that is one 448-wide block.
    tl = true_len if true_len is not None else s
    block_k, nb = seq_blocks(tl)
    s_pad = block_k * nb
    bq = min(_FLAT_BLOCK_Q, block_k)
    qf = _fit_rows(q2, s_pad)
    kf = _fit_rows(k2, s_pad)
    vf = _fit_rows(v2, s_pad)
    true_len = jnp.full((1,), tl, jnp.int32)

    bb = _pick_batch_group(b, s_pad, hb * d)

    grid = (b // bb, h // hb, s_pad // bq)
    kernel = functools.partial(_flat_kernel, hb=hb, d=d, scale=scale, bb=bb,
                               block_k=block_k)
    qspec = pl.BlockSpec(
        (bb, bq, hb * d), lambda bi, hg, qb, *_: (bi, qb, hg),
        memory_space=pltpu.VMEM,
    )
    kvspec = pl.BlockSpec(
        (bb, s_pad, hb * d), lambda bi, hg, qb, *_: (bi, 0, hg),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[qspec, kvspec, kvspec],
            out_specs=qspec,
        ),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, hd), out_dtype),
        interpret=jax.default_backend() == "cpu",
    )(true_len, qf, kf, vf)
    return _fit_rows(out, s)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "out_dtype", "true_len"))
def flash_mha_flat_qkv(qkv3: jax.Array, *, num_heads: int, out_dtype=None,
                       true_len: "int | None" = None):
    """Fused attention directly on the qkv projection output.

    ``qkv3``: [B, S, 3*H*D] laid out [q | k | v] on the channel axis (the
    qkv Dense's natural output). Identical math to ``flash_mha_flat`` on
    the three slices, but the q/k/v views are expressed as BlockSpec
    index maps into the ONE array — XLA materialises a strided slice of a
    [B, S, 3D] tensor as a full copy before a custom call, so the sliced
    form pays ~2x qkv-sized HBM traffic per layer that this entry point
    removes. Returns [B, S, H*D].
    """
    out_dtype = out_dtype or qkv3.dtype
    b, s, hd3 = qkv3.shape
    hd = hd3 // 3
    h = num_heads
    d = hd // h
    scale = 1.0 / (d**0.5)
    hb = HEADS_PER_PROGRAM

    tl = true_len if true_len is not None else s
    block_k, nb = seq_blocks(tl)
    s_pad = block_k * nb
    bq = min(_FLAT_BLOCK_Q, block_k)
    qkvf = _fit_rows(qkv3, s_pad)
    true_len = jnp.full((1,), tl, jnp.int32)

    bb = _pick_batch_group(b, s_pad, hb * d)

    nhg = h // hb  # head groups; q/k/v sit nhg block-columns apart
    grid = (b // bb, nhg, s_pad // bq)
    kernel = functools.partial(_flat_kernel, hb=hb, d=d, scale=scale, bb=bb,
                               block_k=block_k)
    qspec = pl.BlockSpec(
        (bb, bq, hb * d), lambda bi, hg, qb, *_: (bi, qb, hg),
        memory_space=pltpu.VMEM,
    )
    kspec = pl.BlockSpec(
        (bb, s_pad, hb * d), lambda bi, hg, qb, *_: (bi, 0, nhg + hg),
        memory_space=pltpu.VMEM,
    )
    vspec = pl.BlockSpec(
        (bb, s_pad, hb * d), lambda bi, hg, qb, *_: (bi, 0, 2 * nhg + hg),
        memory_space=pltpu.VMEM,
    )
    ospec = pl.BlockSpec(
        (bb, bq, hb * d), lambda bi, hg, qb, *_: (bi, qb, hg),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[qspec, kspec, vspec],
            out_specs=ospec,
        ),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, hd), out_dtype),
        interpret=jax.default_backend() == "cpu",
    )(true_len, qkvf, qkvf, qkvf)
    return _fit_rows(out, s)


def flash_mha_from_qkv(qkv3: jax.Array, *, num_heads: int, out_dtype=None,
                       true_len: "int | None" = None):
    """Model-facing dispatch over the two flat entry points.

    Default: ``flash_mha_flat_qkv`` (q/k/v as BlockSpec index-map views
    into the one [B, S, 3HD] array — no materialised channel slices).
    ``PNP_FLASH_QKV=0`` routes through plain channel slices +
    ``flash_mha_flat`` instead, for end-to-end A/B of exactly the
    qkv-view change (same ``_flat_kernel`` body either way, so the
    outputs are bit-identical; only the HBM traffic differs).
    """
    if os.environ.get("PNP_FLASH_QKV", "1") in ("0", "false"):
        hd = qkv3.shape[-1] // 3
        return flash_mha_flat(
            qkv3[..., :hd], qkv3[..., hd:2 * hd], qkv3[..., 2 * hd:],
            num_heads=num_heads, out_dtype=out_dtype, true_len=true_len,
        )
    return flash_mha_flat_qkv(
        qkv3, num_heads=num_heads, out_dtype=out_dtype, true_len=true_len,
    )


# ---------------------------------------------------------------------------
# Attention + output-projection + residual in one kernel
# ---------------------------------------------------------------------------
#
# The fused ViT block ran as 3 Pallas calls + one XLA matmul:
#   ln_matmul (LN1+qkv) -> flash -> XLA proj+residual -> ln_mlp_residual.
# This kernel folds the proj and the residual into the attention program,
# removing the attention-output HBM round trip ([B, S, HD] written by the
# flash kernel, re-read by the proj matmul — ~72 MB/layer at B=35) and
# the XLA dispatch between the Pallas calls. One program computes a
# whole q-block's attention for a group of heads, collects the head
# slices in VMEM, runs ONE [bq, hb*D_h] @ [hb*D_h, D] proj dot per head
# group, and f32-accumulates partial proj products across head groups in
# a scratch that starts at x + proj_bias (grid: head groups innermost,
# "arbitrary"). At 336px all 16 heads fit one program (nhg=1: grid
# collapses to 35 programs/layer and the proj contraction is a single
# full-depth dot); at 768px K/V VMEM forces nhg=2.


def _proj_heads_per_program(h: int, d: int, s_pad: int, bq: int,
                            dm: int) -> int:
    """Largest head group whose VMEM working set fits (~12 MB budget —
    the estimate below includes Mosaic's input double-buffering but not
    the per-head [bq, block_k] f32 score transients, hence the headroom;
    hb=16 at 336px measured 20.4 MB scoped and was rejected by Mosaic).
    A single group (hb == h) additionally makes the proj contraction one
    full-depth dot, bit-identical to the unfused XLA proj.
    PNP_FLASH_PROJ_HB forces a value for A/B runs."""
    env = os.environ.get("PNP_FLASH_PROJ_HB")
    if env:
        return int(env)
    for hb in (h, 8, 4, 2):
        if h % hb or (hb * d) % 128:
            continue
        hd = hb * d
        # double-buffered streamed inputs (q/k/v views + x) + pk + out +
        # f32 acc + bf16 out-slice scratch, bytes
        est = (2 * (bq * hd + 2 * s_pad * hd + bq * dm) + hd * dm
               + bq * dm) * 2 + bq * dm * 4 + bq * hd * 2
        if est <= 12 * 1024 * 1024:
            return hb
    return HEADS_PER_PROGRAM


def _flat_proj_kernel(len_ref, q_ref, k_ref, v_ref, x_ref, pk_ref, pb_ref,
                      o_ref, osl_ref, acc_ref, *, hb: int, d: int,
                      scale: float, block_k: int, nhg: int):
    """(bi, qb, hg) program: attention for head group hg of q block qb,
    head slices collected in VMEM, one proj dot per group, partial proj
    products f32-accumulated across the (innermost, sequential) hg axis.

    acc holds the f32 proj partial sums; the final combine is
    x + (acc.astype(out_dtype) + proj_bias) in out_dtype arithmetic —
    the exact value flow (and rounding points) of the unfused
    `flash -> jnp.dot(out, pk) + pb + x` chain, so at nhg=1 the output
    is bit-identical to the unfused path.
    """
    hg = pl.program_id(2)
    true_len = len_ref[0]
    bq = q_ref.shape[1]
    s_pad = k_ref.shape[1]
    num_kb = s_pad // block_k
    neg = jnp.float32(_NEG_INF)

    @pl.when(hg == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    for i in range(hb):  # static unroll: head slices are lane-aligned
        q = q_ref[0, :, i * d:(i + 1) * d].astype(jnp.float32) * scale

        def kb_body(kb, carry):
            acc, m_prev, l_prev = carry
            k = k_ref[0, pl.ds(kb * block_k, block_k),
                      i * d:(i + 1) * d].astype(jnp.float32)
            v = v_ref[0, pl.ds(kb * block_k, block_k),
                      i * d:(i + 1) * d].astype(jnp.float32)
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
            col = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), dimension=1)
            s = jnp.where(col < true_len, s, neg)
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jnp.dot(
                p, v, preferred_element_type=jnp.float32)
            return acc, m_new, l_new

        acc0 = jnp.zeros((bq, d), jnp.float32)
        m0 = jnp.full((bq, 1), neg, jnp.float32)
        l0 = jnp.zeros((bq, 1), jnp.float32)
        if num_kb == 1:
            a, _, l = kb_body(0, (acc0, m0, l0))
        else:
            a, _, l = jax.lax.fori_loop(0, num_kb, kb_body, (acc0, m0, l0))
        osl_ref[:, i * d:(i + 1) * d] = (a / l).astype(osl_ref.dtype)

    acc_ref[...] += jnp.dot(osl_ref[...], pk_ref[...],
                            preferred_element_type=jnp.float32)

    @pl.when(hg == nhg - 1)
    def _():
        x_blk = x_ref[0]
        o_ref[0] = x_blk + (acc_ref[...].astype(o_ref.dtype)
                            + pb_ref[0, :][None, :].astype(o_ref.dtype))


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "out_dtype", "true_len"))
def flash_mha_qkv_proj(qkv3: jax.Array, x: jax.Array, proj_k: jax.Array,
                       proj_b: jax.Array, *, num_heads: int,
                       out_dtype=None, true_len: "int | None" = None):
    """x + attention(qkv) @ proj_k + proj_b, one Pallas kernel.

    ``qkv3``: [B, S, 3*H*D] (the qkv Dense's output, [q | k | v] on the
    channel axis, BlockSpec views — nothing materialised); ``x``:
    [B, S, Dm] residual stream; ``proj_k``: [H*D, Dm]; ``proj_b``: [Dm].
    Same canonical tight k-schedule as the other entry points. Returns
    [B, S, Dm] — the post-attention residual stream, ready for
    ln_mlp_residual.
    """
    out_dtype = out_dtype or x.dtype
    b, s, hd3 = qkv3.shape
    hd = hd3 // 3
    dm = x.shape[-1]
    h = num_heads
    d = hd // h
    scale = 1.0 / (d**0.5)

    tl = true_len if true_len is not None else s
    block_k, nb = seq_blocks(tl)
    s_pad = block_k * nb
    bq = min(_FLAT_BLOCK_Q, block_k)
    hb = _proj_heads_per_program(h, d, s_pad, bq, dm)
    nhg = h // hb
    qkvf = _fit_rows(qkv3, s_pad)
    xf = _fit_rows(x, s_pad)
    true_len_arr = jnp.full((1,), tl, jnp.int32)

    nq = h // hb  # q/k/v sit nq block-columns apart in qkv3
    grid = (b, s_pad // bq, nhg)
    kernel = functools.partial(_flat_proj_kernel, hb=hb, d=d, scale=scale,
                               block_k=block_k, nhg=nhg)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, hb * d),
                             lambda bi, qb, hg, *_: (bi, qb, hg),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s_pad, hb * d),
                             lambda bi, qb, hg, *_: (bi, 0, nq + hg),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s_pad, hb * d),
                             lambda bi, qb, hg, *_: (bi, 0, 2 * nq + hg),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bq, dm),
                             lambda bi, qb, hg, *_: (bi, qb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hb * d, dm),
                             lambda bi, qb, hg, *_: (hg, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, dm), lambda bi, qb, hg, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, dm),
                                   lambda bi, qb, hg, *_: (bi, qb, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((bq, hb * d), out_dtype),
                pltpu.VMEM((bq, dm), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, dm), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() == "cpu",
    )(true_len_arr, qkvf, qkvf, qkvf, xf, proj_k,
      proj_b.reshape(1, dm))
    return _fit_rows(out, s)


def proj_fold_enabled(true_len: "int | None" = None) -> bool:
    """Whether the attention+proj+residual fused kernel should handle
    this sequence. Default (auto, round-5 TPU A/B): ON in the
    long-sequence streaming regime — more than one k block, where the
    removed attention-output HBM round trip dominates (768px/2305
    tokens: 10.19 img/s fused vs 9.87 unfused) — and OFF in the
    single-block regime, where the bb-batch-grouped flat kernel wins
    instead (336px: 63.8 grouped-unfused vs 63.0 proj-fold; the proj
    kernel runs one batch per program, so it cannot amortise program
    issue overhead the way the grouped kernel does).
    PNP_FLASH_PROJ=1/0 forces either way for A/B runs."""
    env = os.environ.get("PNP_FLASH_PROJ", "auto")
    if env in ("0", "false"):
        return False
    if env in ("auto", ""):
        if true_len is None:
            return False
        _, nb = seq_blocks(true_len)
        return nb > 1
    return True


def xlen_supported(sq: int, skv: int, h: int, d: int) -> bool:
    """Shapes the cross-length entry point can run (sequence-parallel
    q chunks: sq is the LOCAL chunk, skv the full gathered length)."""
    return (
        d in (64, 128)
        and skv >= 128
        and sq >= 16
        and h % HEADS_PER_PROGRAM == 0
        and (HEADS_PER_PROGRAM * d) % 128 == 0
    )


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "out_dtype", "true_kv_len"))
def flash_mha_flat_xlen(q2: jax.Array, k2: jax.Array, v2: jax.Array, *,
                        num_heads: int, out_dtype=None,
                        true_kv_len: "int | None" = None):
    """Cross-length flat attention: q [B, Sq, H*D], k/v [B, Skv, H*D].

    The sequence-parallel entry point (SURVEY §5: the reference has no
    long-context strategy at all): each device holds a contiguous Sq-sized
    chunk of the query rows while attending over the full gathered K/V.
    Same ``_flat_kernel`` body and k-block schedule as ``flash_mha_flat``
    — a q row's online-softmax visits the same 512-wide k blocks in the
    same order, so per-row outputs are bit-identical to the equal-length
    entry points. ``true_kv_len`` masks gathered keys beyond the real
    sequence (padded rows travel with the last chunk). bb grouping is
    disabled (chunks are small; one program per (batch, head-group,
    q-block) already amortises).
    """
    out_dtype = out_dtype or q2.dtype
    b, sq, hd = q2.shape
    skv = k2.shape[1]
    h = num_heads
    d = hd // h
    scale = 1.0 / (d**0.5)
    hb = HEADS_PER_PROGRAM

    # Canonical k-schedule keyed on the TRUE kv length — identical block
    # widths/order to the equal-length entry points, so per-row outputs
    # stay bit-identical to the unsharded encode no matter how the
    # sharded caller padded its gathered K/V.
    tkl = true_kv_len if true_kv_len is not None else skv
    block_k, nbk = seq_blocks(tkl)
    skv_pad = block_k * nbk
    # q rows: bf16 tiles need sublane multiples of 16; one block when the
    # chunk fits, else tile at the standard q-block size.
    sq_pad = -(-sq // 16) * 16
    bq = min(_FLAT_BLOCK_Q, sq_pad)
    sq_pad = -(-sq_pad // bq) * bq
    qf = jnp.pad(q2, [(0, 0), (0, sq_pad - sq), (0, 0)])
    kf = _fit_rows(k2, skv_pad)
    vf = _fit_rows(v2, skv_pad)
    true_len = jnp.full((1,), tkl, jnp.int32)

    grid = (b, h // hb, sq_pad // bq)
    kernel = functools.partial(_flat_kernel, hb=hb, d=d, scale=scale, bb=1,
                               block_k=block_k)
    qspec = pl.BlockSpec(
        (1, bq, hb * d), lambda bi, hg, qb, *_: (bi, qb, hg),
        memory_space=pltpu.VMEM,
    )
    kvspec = pl.BlockSpec(
        (1, skv_pad, hb * d), lambda bi, hg, qb, *_: (bi, 0, hg),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[qspec, kvspec, kvspec],
            out_specs=qspec,
        ),
        out_shape=jax.ShapeDtypeStruct((b, sq_pad, hd), out_dtype),
        interpret=jax.default_backend() == "cpu",
    )(true_len, qf, kf, vf)
    return out[:, :sq, :]


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
