"""Fused LayerNorm+matmul Pallas kernels for the ViT-L block.

The ViT encode is the pipeline's single largest cost (4 drop rounds re-run
it per batch, reference :589-605). A TPU bisect of the 24-layer encode at
B=35/336px put the plain matmuls at 41.7 ms but the full block at 91 ms:
the LayerNorms add ~19 ms and the exact-erf gelu ~17 ms, because XLA
materialises the f32 LN intermediates and the [M, 4096] fc1 activation in
HBM instead of fusing them into the adjacent matmuls (the dot boundary
blocks elementwise fusion on TPU, same failure mode as the CRF build —
ops/bilateral_pallas.py).

Two kernels remove that traffic while keeping the parameter tree and the
math identical to the unfused Flax ops (f32 LayerNorm, bf16 matmul
operands, f32 MXU accumulation, exact erf gelu — numerics differ from
the unfused chain only in float-op ordering; measured on TPU the fused
bf16 encode sits exactly as close to an f32 oracle as the unfused bf16
encode, mean rel 3.5% vs 3.4% after 24 random-weight layers):

- ``ln_matmul``:      y = LN(x) @ W + b          (norm1 + qkv projection)
- ``ln_mlp_residual``: y = x + gelu(LN(x)@W1+b1)@W2 + b2
                       (norm2 + the whole MLP; the [BM, BF] activation
                       tile lives only in VMEM)

Measured (24-layer chain at B=35/S=512): MLP half 54.9 -> 46.3 ms,
LN1+qkv half ~8 ms saved; full ViT encode 91 -> ~78 ms; end-to-end
bench 47.1 -> 51.2 img/s.

Both stream weight blocks through VMEM with a scratch accumulator over
the contraction grid axis; the LN of each row block is computed once
into a VMEM scratch (grid iterations over the inner axis share the row
block).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BM = 512        # row-block (B*S rows)
_BN_QKV = 1024   # output-column block of ln_matmul
_BF = 512        # hidden-column block of the MLP kernel


def supported(d_model: int, d_out: int | None = None,
              mlp_hidden: int | None = None) -> bool:
    """Shapes the kernels tile cleanly (wrappers pad rows, never cols).

    ``mlp_hidden`` (F = d_model * mlp_ratio) must be a 128-multiple for
    ln_mlp_residual — its hidden axis is BLOCKED, never padded, so a
    ragged F would silently drop the tail channels without this gate
    (and ln_mlp_residual itself raises as a backstop).
    """
    ok = d_model % 128 == 0
    if d_out is not None:
        ok = ok and d_out % 128 == 0
    if mlp_hidden is not None:
        ok = ok and mlp_hidden % 128 == 0
    return ok


def _layer_norm_f32(x32, gamma_ref, beta_ref, eps):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    h = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return h * gamma_ref[0, :][None, :] + beta_ref[0, :][None, :]


def _ln_matmul_kernel(x_ref, g_ref, b_ref, w_ref, bias_ref, o_ref,
                      xln_ref, *, eps: float):
    """(i, j) program: o[i, j] = LN(x[i]) @ w[:, j] + bias[j].

    The LN of the row block is computed once (j == 0) into the VMEM
    scratch and reused by the remaining column blocks — grid steps over
    j run sequentially on the same core with i fixed.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        x32 = x_ref[...].astype(jnp.float32)
        xln_ref[...] = _layer_norm_f32(x32, g_ref, b_ref, eps).astype(
            xln_ref.dtype)

    y = jnp.dot(xln_ref[...], w_ref[...],
                preferred_element_type=jnp.float32)
    o_ref[...] = (y + bias_ref[0, :][None, :].astype(jnp.float32)).astype(
        o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "out_dtype"))
def ln_matmul(x: jax.Array, gamma: jax.Array, beta: jax.Array,
              w: jax.Array, bias: jax.Array, *,
              eps: float = 1e-6, out_dtype=jnp.bfloat16) -> jax.Array:
    """LN(x) @ w + bias with the LN fused into the matmul read.

    x: [M, D] (any M; rows are blocked internally — PNP_LNQKV_BM tunes
    the target row block; the full weight streams through VMEM once per
    row block, so larger blocks cut the weight-refetch traffic),
    gamma/beta: [D] f32, w: [D, N] (N % 128 == 0), bias: [N].
    Returns [M, N] in ``out_dtype``. Matmul operands are cast to
    ``out_dtype`` (bf16 on TPU) exactly like the unfused
    ``nn.LayerNorm -> astype -> nn.Dense`` chain; accumulation is f32.
    """
    m, d = x.shape
    n = w.shape[1]
    bm = _pick_bm(m, int(os.environ.get("PNP_LNQKV_BM", _BM)))
    m_pad = -(-m // bm) * bm
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    bn = _BN_QKV if n % _BN_QKV == 0 else 128
    grid = (m_pad // bm, n // bn)
    kernel = functools.partial(_ln_matmul_kernel, eps=eps)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, d), out_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * d * n,
            bytes_accessed=m_pad * d * 2 + d * n * 2 + m_pad * n * 2,
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(x, gamma.reshape(1, d), beta.reshape(1, d), w, bias.reshape(1, n))
    return out[:m]


# Minimax-fit erf for the Mosaic kernel (lax.erf has no TPU Pallas
# lowering). Single branch: erf(x) = x * P(x^2) fit on |x| <= 2.2 (f32
# Horner accuracy 9.6e-7 abs), |x| clamped to 2.2. The clamp is exact
# at the OUTPUT precision: the consumer rounds erf to bf16, whose last
# value below 1.0 is 255/256 — erf(x) rounds to 1.0 for every x >= 2.19,
# and P(2.2^2)*2.2 = 0.998137 also rounds to 1.0, so the clamped branch
# agrees with a full erf bit-for-bit after the bf16 round. Dropping the
# tail branch (exp + second Horner) halves the VPU cost, which is what
# bounds the fused MLP kernel (53.7 -> 47 ms measured with the cheap
# erf; identity-gelu floor 40.7 ms).
_ERF_P = (1.128379139571155, -0.3761252259731045, 0.11282976424513898,
          -0.026843839553998192, 0.0051925774717181995,
          -0.0008290527520228961, 0.00010732167832988502,
          -1.0523825720237124e-05, 6.793275336392753e-07,
          -2.1076366182700845e-08)


def _horner(coeffs, t):
    acc = jnp.full_like(t, coeffs[-1])
    for c in coeffs[-2::-1]:
        acc = acc * t + jnp.float32(c)
    return acc


def _erf_f32(x):
    xc = jnp.clip(x, -2.2, 2.2)
    return xc * _horner(_ERF_P, xc * xc)


def _erf_f32_full(x):
    """f32-accurate erf: cheap poly core + erfc tail for |x| > 2.2.

    The bf16 path can clamp at 2.2 because erf(x >= 2.19) rounds to 1.0
    in bf16; at f32 output precision that clamp leaves up to ~2e-3
    absolute gelu error in the tail (ADVICE r3 low #3). Tail branch:
    Abramowitz-Stegun 7.1.26 erfc rational fit, |eps| <= 1.5e-7 — well
    inside the 3e-4 equivalence tolerance the f32 tests assert. Both
    branches are computed vectorized and selected; the extra exp only
    rides the f32 configs (CPU path / f32 dtype), never the shipping
    bf16 kernel.
    """
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + jnp.float32(0.3275911) * ax)
    poly = t * (jnp.float32(0.254829592) + t * (
        jnp.float32(-0.284496736) + t * (jnp.float32(1.421413741) + t * (
            jnp.float32(-1.453152027) + t * jnp.float32(1.061405429)))))
    tail = jnp.float32(1.0) - poly * jnp.exp(-ax * ax)
    return jnp.where(ax <= 2.2, _erf_f32(x), jnp.sign(x) * tail)


def _gelu_exact(y16):
    """Exact-erf gelu: y * (erf(y/sqrt2) + 1) / 2, same steps and dtype
    flow as jax.nn.gelu(approximate=False).

    bf16 output uses the single-branch clamped erf — validated by
    enumerating ALL finite bf16 inputs against jitted jax.nn.gelu on the
    TPU: 24 mismatching codes in the realistic domain (|y| < 3.5, abs
    diff <= 2.4e-3 — the bf16 (e+1) cancellation zone where XLA's own
    output is ~1-ulp noise), everything else bit-equal or below 4e-23
    absolute. Non-bf16 outputs get the tail-corrected erf (see
    _erf_f32_full).
    """
    dt = y16.dtype
    sqrt2 = jnp.asarray(np.sqrt(2), dt)
    t = y16 / sqrt2
    erf = _erf_f32 if dt == jnp.bfloat16 else _erf_f32_full
    e = erf(t.astype(jnp.float32)).astype(dt)
    # (e+1)/2 first: the halving is exact (exponent shift) so the single
    # rounding happens at the same multiply as XLA's x*(e+1)/2 order,
    # without overflowing y*(e+1) near the bf16 max.
    half = (e + jnp.asarray(1, dt)) / jnp.asarray(2, dt)
    return y16 * half


def _ln_mlp_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   o_ref, xln_ref, acc_ref, *, eps: float, f_blocks: int):
    """(i, j) program: one BF-wide slice of the fused MLP for row block i.

        h   = LN(x[i])                    (j == 0, into VMEM scratch)
        y_j = gelu(h @ w1[:, j] + b1[j])  ([BM, BF] — never leaves VMEM)
        acc += y_j @ w2[j, :]
        o[i] = x[i] + acc + b2            (j == last)

    (A software-pipelined variant staggering the gelu one grid step
    behind the dots was measured SLOWER — 60.3 vs 53.7 ms for the
    24-layer MLP half — so the straight dependent chain is kept.)
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        x32 = x_ref[...].astype(jnp.float32)
        xln_ref[...] = _layer_norm_f32(x32, g_ref, b_ref, eps).astype(
            xln_ref.dtype)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    y = jnp.dot(xln_ref[...], w1_ref[...],
                preferred_element_type=jnp.float32)
    y = (y + b1_ref[0, :][None, :].astype(jnp.float32)).astype(
        xln_ref.dtype)
    g = _gelu_exact(y).astype(xln_ref.dtype)
    acc_ref[...] += jnp.dot(g, w2_ref[...],
                            preferred_element_type=jnp.float32)

    @pl.when(j == f_blocks - 1)
    def _():
        out = acc_ref[...] + b2_ref[0, :][None, :].astype(jnp.float32)
        o_ref[...] = x_ref[...] + out.astype(o_ref.dtype)


def _pick_bm(m: int, target: int) -> int:
    """Largest row block <= target that divides m (sublane-mult of 8)."""
    for bm in range(min(target, m), 7, -8):
        if m % bm == 0:
            return bm
    return min(target, m)


@functools.partial(jax.jit,
                   static_argnames=("eps", "out_dtype", "bm", "bf"))
def ln_mlp_residual(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                    w1: jax.Array, b1: jax.Array,
                    w2: jax.Array, b2: jax.Array, *,
                    eps: float = 1e-6, out_dtype=jnp.bfloat16,
                    bm: int = 784, bf: int = 512) -> jax.Array:
    """x + gelu(LN(x) @ w1 + b1) @ w2 + b2, one Pallas kernel.

    x: [M, D]; w1: [D, F]; w2: [F, D]; F % bf == 0, D % 128 == 0.
    The [M, F] activation exists only as [bm, bf] VMEM tiles — the
    unfused chain writes/reads it (plus the gelu round trip) through
    HBM, ~380 MB per ViT-L layer at B=35. The full W1/W2 stream through
    VMEM once per ROW block, so bm is chosen as large as the VMEM
    working set allows (row count M/bm is the weight-refetch factor).

    The 784 target is the largest row block that compiles for EVERY M:
    bm=896 (the round-3 chain-tuned value) exceeds the 16 MB scoped-VMEM
    limit at some grids — the round-5 batch sweep measured 16.67 MB OOM
    at M=17920 (B=40) and M=25088 (B=56) while M=18816 (B=42) fit; the
    boundary is not predictable from the block shape alone. Production
    B=35 (M=15680, not 896-divisible) always descended to bm=784, so
    this default changes no shipping config (768px M=27840 descends to
    696 from either target). PNP_MLP_BM forces a target for A/B runs;
    bit-identical math at any bm (full-depth contraction per block).
    """
    m, d = x.shape
    f = w1.shape[1]
    env_bm = os.environ.get("PNP_MLP_BM")
    if env_bm:
        bm = int(env_bm)
    bm = _pick_bm(m, bm)
    m_pad = -(-m // bm) * bm
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    if f % bf != 0:
        bf = 128
    if f % bf != 0:
        # The hidden axis is blocked, never padded: a ragged F would
        # silently drop the tail channels (ADVICE r3 medium #1).
        raise ValueError(
            f"ln_mlp_residual needs the MLP hidden dim to be a multiple "
            f"of 128, got F={f}; gate on vit_block_pallas.supported("
            f"d, mlp_hidden=F) and fall back to the unfused path")
    f_blocks = f // bf
    grid = (m_pad // bm, f_blocks)
    kernel = functools.partial(_ln_mlp_kernel, eps=eps, f_blocks=f_blocks)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, bf), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bf), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bf, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, d), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, d), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, d), out_dtype),
            pltpu.VMEM((bm, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * m_pad * d * f,
            bytes_accessed=m_pad * d * 4 + d * f * 4,
            transcendentals=m_pad * f,
        ),
        interpret=jax.default_backend() == "cpu",
    )(x, gamma.reshape(1, d), beta.reshape(1, d),
      w1, b1.reshape(1, f), w2, b2.reshape(1, d))
    return out[:m]
