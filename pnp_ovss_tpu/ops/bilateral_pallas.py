"""Fused Gaussian-kernel matmul (bilateral filtering) Pallas kernel.

The DenseCRF bilateral message  m_i = sum_j exp(-||f_i - f_j||^2 / 2) v_j
over per-pixel features f (scaled position + colour) is the reference's one
true native-code dependency (pydensecrf's C++ permutohedral lattice, driver
:1030-1074). On TPU the exact computation maps onto the MXU as a
flash-attention-style tiled kernel:

    exp(-||f_i - f_j||^2 / 2) = exp(f_i . f_j - ||f_i||^2/2 - ||f_j||^2/2)

so each (i-block, j-block) tile is one small matmul F_i @ F_j^T, an exp, and
one accumulation matmul P @ V_j — the [N, N] kernel matrix never exists in
HBM, and tiles stream through VMEM via a 2D grid with output revisiting.
Unlike the permutohedral lattice this is *exact*, not an approximation.

Feature dim is padded to 8, value channels to a multiple of 128 lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_I = 512
BLOCK_J = 512
FEAT_PAD = 8
_BIG = 1e30


def _bilateral_kernel(f_i_ref, n_i_ref, f_j_ref, n_j_ref, v_j_ref, o_ref):
    """One (i, j) tile: o[i] += exp(F_i F_j^T - n_i - n_j) @ V_j.

    The feature matmul F_i @ F_j^T sits in the EXPONENT, so it must run at
    true f32 precision (Precision.HIGHEST -> the bf16x3 decomposition):
    the MXU's default bf16 truncation puts O(||f||^2 * 2^-9) ~ O(10)
    absolute error in the exponent at real bilateral scales (rgb/5 spans
    0..51, so ||f||^2 ~ 8e3) — measured up to 1e9 relative kernel error
    before this was pinned. The d2 matmul is K=8 deep, a rounding error of
    the C-deep value matmul, so HIGHEST costs nothing. The kernel matmul
    k @ V stays bf16 (2x the f32 MXU rate on v5e): k entries are in
    [0, 1] and V holds probabilities, so message error is ~1e-3 relative.
    Accumulation stays f32.
    """
    jb = pl.program_id(1)

    @pl.when(jb == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    f_i = f_i_ref[:].astype(jnp.float32)
    s = jnp.dot(f_i, f_j_ref[:].astype(jnp.float32).T,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    k = jnp.exp(s - n_i_ref[:].astype(jnp.float32)
                - n_j_ref[:].astype(jnp.float32).T)
    o_ref[:] += jnp.dot(k.astype(jnp.bfloat16),
                        v_j_ref[:].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)


def _pad_feats(features: jax.Array, n_pad: int) -> jax.Array:
    n, f = features.shape
    feats = jnp.zeros((n_pad, FEAT_PAD), jnp.float32)
    feats = feats.at[:n, :f].set(features.astype(jnp.float32))
    half_norms = 0.5 * jnp.sum(feats * feats, axis=-1, keepdims=True)
    row = jnp.arange(n_pad)[:, None]
    half_norms = jnp.where(row < n, half_norms, _BIG)
    return feats, half_norms


@jax.jit
def gaussian_kernel_matmul(
    features: jax.Array,
    values: jax.Array,
    features_j=None,
):
    """m_i = sum_j exp(-||f_i - f_j||^2 / 2) v_j, self included.

    features: [N, F] (F <= 8), values: [M, C] with M == N unless
    ``features_j`` ([M, F]) gives a separate j-side support — used for
    subsampled message passing where j runs over a strided pixel subset.
    Returns [N, C] float32. Padded rows contribute nothing (their half
    norms are huge, so their kernel entries underflow to zero).
    """
    n, f = features.shape
    if features_j is None:
        features_j = features
    m = features_j.shape[0]
    c = values.shape[-1]
    n_pad = -(-n // BLOCK_I) * BLOCK_I
    m_pad = -(-m // BLOCK_J) * BLOCK_J
    c_pad = -(-c // 128) * 128

    feats_i, norms_i = _pad_feats(features, n_pad)
    feats_j, norms_j = _pad_feats(features_j, m_pad)
    vals = jnp.zeros((m_pad, c_pad), jnp.float32)
    vals = vals.at[:m, :c].set(values.astype(jnp.float32))

    grid = (n_pad // BLOCK_I, m_pad // BLOCK_J)
    out = pl.pallas_call(
        _bilateral_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_I, FEAT_PAD), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_I, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_J, FEAT_PAD), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_J, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_J, c_pad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_I, c_pad), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, c_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * m_pad * (FEAT_PAD + c_pad),
            bytes_accessed=(n_pad + m_pad) * (FEAT_PAD + c_pad + 2) * 4,
            transcendentals=n_pad * m_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            # i tiles are independent; j is the reduction (output revisit).
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() == "cpu",
    )(feats_i, norms_i, feats_j, norms_j, vals)
    return out[:n, :c]


KT_QUANT_SCALE = 255.0  # uint8 kernel storage: k in [0, 1] -> round(k*255)


def _materialize_kernel(f_j_ref, n_j_ref, f_i_ref, n_i_ref, o_ref):
    """One (j, i) tile of the materialised kernel: d2 + exp + store, all
    in VMEM. Same HIGHEST-precision exponent rule as _bilateral_kernel.

    uint8 output stores round(k * KT_QUANT_SCALE): kernel entries live in
    [0, 1] (unnormalised Gaussian, self-entry 1), so a global scale keeps
    the absolute quantisation error at 1/510 — the consumer folds the
    1/KT_QUANT_SCALE back into its per-column normaliser. Halves the
    dominant per-iteration kernel read traffic vs bf16.
    """
    s = jnp.dot(f_j_ref[:].astype(jnp.float32),
                f_i_ref[:].astype(jnp.float32).T,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    k = jnp.exp(
        s - n_j_ref[:].astype(jnp.float32)
        - n_i_ref[:].astype(jnp.float32).T
    )
    if o_ref.dtype == jnp.uint8:
        # Mosaic has no direct f32->uint8 cast (only fptosi to SIGNED and
        # 32->8-bit trunci); round -> int32 -> uint8 lowers as
        # fptosi + trunci, bit-identical for values in [0, 255].
        o_ref[:] = (
            jnp.round(k * KT_QUANT_SCALE)
            .astype(jnp.int32).astype(jnp.uint8)
        )
    else:
        o_ref[:] = k.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "keep_padded_rows"))
def gaussian_kernel_materialize(
    features_j: jax.Array,  # [M, F] (rows of the output)
    features: jax.Array,  # [N, F] (columns)
    *,
    out_dtype=jnp.bfloat16,
    keep_padded_rows: bool = False,
):
    """K^T[m, n] = exp(-||f_j[m] - f_i[n]||^2 / 2) -> [M, N] in out_dtype.

    Used by the materialised-kernel CRF path (ops/crf.py): the naive jnp
    build writes the [M, N] f32 ``d2`` intermediate to HBM (~340 MB at
    192px/s=4 — XLA does not fuse elementwise consumers into dot outputs
    on TPU) before the exp re-reads it; this kernel keeps each d2 tile in
    VMEM and writes ONLY the bf16 kernel, cutting the build's traffic
    ~5x. Padded rows/columns get huge half-norms -> exp underflows to an
    exact 0, so downstream matmuls may keep them; ``keep_padded_rows``
    returns the row-padded [M_pad, N] array (exact-zero pad rows) so the
    fused-iteration path can matmul against it without a slice copy.
    """
    m = features_j.shape[0]
    n = features.shape[0]
    # Row padding only needs the consumer's 128-alignment (the fused
    # iteration matmuls [R, M_pad] @ [M_pad, N] directly); padding rows
    # to the full 512 tile inflated the dominant per-iteration kernel
    # read by the pad fraction (+11% at bucket 192/s4: M=2304 -> 2560).
    # The row grid tile is the largest block dividing the aligned M —
    # the build runs once per image, so a finer row grid costs nothing.
    m_pad = -(-m // 128) * 128
    block_j = next(bj for bj in (512, 384, 256, 128) if m_pad % bj == 0)
    n_pad = -(-n // BLOCK_I) * BLOCK_I
    feats_j, norms_j = _pad_feats(features_j, m_pad)
    feats_i, norms_i = _pad_feats(features, n_pad)

    grid = (m_pad // block_j, n_pad // BLOCK_I)
    out = pl.pallas_call(
        _materialize_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_j, FEAT_PAD), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_j, 1), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_I, FEAT_PAD), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_I, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_j, BLOCK_I), lambda j, i: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * FEAT_PAD,
            bytes_accessed=(m_pad + n_pad) * (FEAT_PAD + 1) * 4
            + m_pad * n_pad * 2,
            transcendentals=m_pad * n_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=jax.default_backend() == "cpu",
    )(feats_j, norms_j, feats_i, norms_i)
    return out[:, :n] if keep_padded_rows else out[:m, :n]


def _crf_iter_kernel(qsub_ref, kt_ref, u_ref, msp_ref, nb_ref, o_ref, *,
                     v: int, c: int):
    """One N-tile of a fused mean-field iteration.

    Computes, entirely in VMEM:
        y   = qsub @ kt                      (bilateral message columns)
        e   = nb * y + msp + u               (nb = bi_w * norm_bi row,
                                              msp = pos_w-scaled spatial
                                              message, u = -unary)
        out = per-variant-block softmax(e)   (rows [vi*c, (vi+1)*c))

    The unfused loop runs the same math as five separate XLA ops, each
    streaming the [v*c, N] f32 state through HBM (measured ~4 ms/iter of
    the 15.4 ms/iter CRF cost at 192px/s4/B35); here everything between
    the kernel-matmul read and the next-state write stays on-chip.

    Refs:
      qsub_ref: [R, M]  bf16/f32 — norm_j-scaled strided-subset state
                (whole, every program; R = v*c padded to sublanes)
      kt_ref:   [M, BN] bf16/f32/uint8 — materialised kernel columns
      u_ref:    [R, BN] f32/bf16 — minus-unary (pad rows zero)
      msp_ref:  [R, BN] f32/bf16 — spatial message, pos_w/norm_sp applied
      nb_ref:   [8, BN] f32 — bi_w * norm_bi (row 0; broadcast rows)
      o_ref:    [R, BN] f32/bf16 — next-iteration Q (pad rows zero)

    u/msp/o may be bf16 (the state-precision knob): energies and the
    softmax always run f32 in-register; only the HBM streams shrink.
    """
    kt = kt_ref[:]
    mm_dtype = qsub_ref.dtype
    if kt.dtype == jnp.uint8:
        # uint8 storage: dequant tile in VMEM. Mosaic cannot cast
        # unsigned->float directly; uint8 -> int32 (extui) -> f32
        # (sitofp) -> mm_dtype all lower natively.
        kt = kt.astype(jnp.int32).astype(jnp.float32).astype(mm_dtype)
    elif kt.dtype != mm_dtype:
        kt = kt.astype(mm_dtype)
    y = jnp.dot(qsub_ref[:], kt, preferred_element_type=jnp.float32)
    # nb carries bi_w * norm_bi (and the 1/KT_QUANT_SCALE fold when the
    # kernel is uint8-quantised), so y needs no separate rescale.
    e = (nb_ref[0:1, :] * y + msp_ref[:].astype(jnp.float32)
         + u_ref[:].astype(jnp.float32))
    r, bn = e.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (r, bn), 0)
    neg = jnp.float32(-1e30)
    out = jnp.zeros((r, bn), jnp.float32)
    for vi in range(v):  # static unroll, v is 1 or 2
        sel = (row >= vi * c) & (row < (vi + 1) * c)
        mv = jnp.max(jnp.where(sel, e, neg), axis=0, keepdims=True)
        pv = jnp.where(sel, jnp.exp(e - mv), 0.0)
        out = out + pv / jnp.sum(pv, axis=0, keepdims=True)
    o_ref[:] = out.astype(o_ref.dtype)


def _pick_bn(n: int) -> int:
    for bn in (512, 384, 256, 128):
        if n % bn == 0:
            return bn
    raise ValueError(f"N={n} not a multiple of 128")


@functools.partial(jax.jit, static_argnames=("v", "c", "out_dtype"))
def crf_fused_iteration(
    qsub: jax.Array,   # [R, M] bf16 (f32 on CPU)
    kt: jax.Array,     # [M, N] bf16/uint8 (f32 on CPU)
    u_neg: jax.Array,  # [R, N] f32 or bf16 (state-precision knob)
    msp: jax.Array,    # [R, N] f32 or bf16
    nb: jax.Array,     # [8, N] f32 (bi_w * norm_bi broadcast rows)
    *,
    v: int,
    c: int,
    out_dtype=jnp.float32,
):
    """Fused bilateral-matmul + energy + blockwise-softmax iteration.

    Caller guarantees: R (rows) a sublane multiple with v*c <= R and pad
    rows of u_neg zero, M a multiple of 128 with pad columns of qsub and
    pad rows of kt zero, N a multiple of 128. Returns [R, N] in
    ``out_dtype`` with pad rows exactly zero (softmax runs f32 in
    VMEM regardless; out_dtype only sets the HBM-resident state width).
    """
    r, m = qsub.shape
    _, n = kt.shape
    bn = _pick_bn(n)
    grid = (n // bn,)
    kernel = functools.partial(_crf_iter_kernel, v=v, c=c)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((r, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, bn), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, n), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * r * m * n,
            bytes_accessed=(
                m * n * kt.dtype.itemsize
                + r * n * (u_neg.dtype.itemsize + msp.dtype.itemsize
                           + jnp.dtype(out_dtype).itemsize)
                + r * m * qsub.dtype.itemsize
            ),
            transcendentals=v * r * n,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=jax.default_backend() == "cpu",
    )(qsub, kt, u_neg, msp, nb)


def gaussian_kernel_matmul_reference(
    features: jax.Array, values: jax.Array, features_j=None
):
    """O(N*M)-memory jnp reference (tests / small inputs / CPU).

    The feature matmul runs at HIGHEST precision for the same reason as
    the Pallas kernel: it feeds an exponent, and the TPU's default bf16
    truncation is catastrophic at real feature magnitudes."""
    f = features.astype(jnp.float32)
    fj = f if features_j is None else features_j.astype(jnp.float32)
    d2 = (
        jnp.sum(f * f, -1)[:, None]
        + jnp.sum(fj * fj, -1)[None, :]
        - 2 * jnp.dot(f, fj.T, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    )
    k = jnp.exp(-0.5 * jnp.maximum(d2, 0.0))
    return k @ values.astype(jnp.float32)
