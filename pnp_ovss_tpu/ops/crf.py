"""Mean-field DenseCRF (Krähenbühl & Koltun), TPU-native.

Reference semantics (driver ``densecrf``, :1030-1074, backed by pydensecrf's
C++ permutohedral lattice):

- unary: U = -log(clip(softmax(mask_logits), 1e-5, 1))  (unary_from_softmax)
- pairwise 1 (appearance-blind): Gaussian kernel, sxy=POS_XY_STD=3,
  Potts weight POS_W=7
- pairwise 2 (bilateral): kernel over (position/Bi_XY_STD=50,
  rgb/Bi_RGB_STD=5), Potts weight Bi_W=10
- 10 mean-field iterations; kernels are symmetrically normalised
  (k' = n_i * k_ij * n_j with n = 1/sqrt(K @ 1)); the Potts update is
      Q <- softmax(-U + sum_m w_m * K'_m(Q))
- argmax over labels.

TPU realisation:
- the spatial Gaussian term is separable: two band-matrix matmuls (MXU),
- the bilateral term uses the fused Gaussian-kernel matmul Pallas kernel
  (ops/bilateral_pallas.py) — exact brute force, no lattice approximation,
- everything is batched over images at a fixed bucket resolution and jits
  into one graph with `lax.fori_loop` over iterations.

`exclude_self` removes each pixel's self-interaction (k_ii = 1) from the
messages; the permutohedral implementation keeps it, so the default False
matches pydensecrf most closely.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from pnp_ovss_tpu.config import CRFConfig
from pnp_ovss_tpu.ops import bilateral_pallas
from pnp_ovss_tpu.ops.bilateral_pallas import (
    crf_fused_iteration,
    gaussian_kernel_materialize,
    gaussian_kernel_matmul,
    gaussian_kernel_matmul_reference,
)


@functools.lru_cache(maxsize=64)
def _diff_matrix_np(n: int) -> np.ndarray:
    """[n, n] index-difference matrix (i - j), float32."""
    idx = np.arange(n, dtype=np.float32)
    return idx[:, None] - idx[None, :]


def spatial_band_matrices(h: int, w: int, sigma):
    """(kh [H, H], kw [W, W]) Gaussian band matrices for the separable
    2D spatial kernel. ``sigma``: float, traced scalar, or shape-[2]
    ``(sigma_y, sigma_x)``; values are computed in-graph from static
    index-difference matrices (H^2 + W^2 exps — noise next to the N*M
    bilateral term)."""
    sigma = jnp.broadcast_to(
        jnp.asarray(sigma, jnp.float32).reshape(-1), (2,)
    )
    kh = jnp.exp(-0.5 * (jnp.asarray(_diff_matrix_np(h)) / sigma[0]) ** 2)
    kw = jnp.exp(-0.5 * (jnp.asarray(_diff_matrix_np(w)) / sigma[1]) ** 2)
    return kh, kw


def _apply_separable(kh, kw, q):
    """kh @ Q @ kw^T per leading index (kh/kw symmetric here)."""
    y = jnp.einsum("ij,...jw->...iw", kh, q.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    return jnp.einsum("ij,...hj->...hi", kw, y,
                      preferred_element_type=jnp.float32)


def spatial_gaussian_apply(q: jax.Array, sigma) -> jax.Array:
    """K @ q for the separable 2D spatial Gaussian. q: [..., H, W]."""
    h, w = q.shape[-2:]
    kh, kw = spatial_band_matrices(h, w, sigma)
    return _apply_separable(kh, kw, q)


def bilateral_features(
    image_rgb: jax.Array, sxy, srgb: float
) -> jax.Array:
    """[H, W, 3] (0-255 RGB) -> [H*W, 5] scaled features.

    ``sxy`` may be a traced scalar or a shape-[2] ``(sxy_x, sxy_y)`` pair
    (per-image per-axis GT-relative rescaling)."""
    h, w, _ = image_rgb.shape
    sxy = jnp.broadcast_to(jnp.asarray(sxy, jnp.float32).reshape(-1), (2,))
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] / sxy[1]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] / sxy[0]
    pos_y = jnp.broadcast_to(ys, (h, w))
    pos_x = jnp.broadcast_to(xs, (h, w))
    rgb = image_rgb.astype(jnp.float32) / srgb
    feats = jnp.concatenate(
        [pos_x[..., None], pos_y[..., None], rgb], axis=-1
    )
    return feats.reshape(h * w, 5)


def _normalised_apply(apply_fn, q_flat: jax.Array, norm: jax.Array,
                      exclude_self: bool) -> jax.Array:
    """Symmetric normalisation: n * K(n * q), optionally minus self term."""
    m = norm * apply_fn(norm * q_flat)
    if exclude_self:
        m = m - (norm * norm) * q_flat
    return m


def mean_field_crf(
    logits: jax.Array,  # [C, H, W] mask maps (pre-softmax, reference :1057)
    image_rgb: jax.Array,  # [H, W, 3] 0-255
    cfg: CRFConfig,
    **kw,
) -> jax.Array:
    """Single-variant mean-field inference; returns labels [H, W] int32."""
    return mean_field_crf_variants(logits[None], image_rgb, cfg, **kw)[0]


def mean_field_crf_variants(
    logits: jax.Array,  # [V, C, H, W]: V unary variants, shared image
    image_rgb: jax.Array,  # [H, W, 3] 0-255
    cfg: CRFConfig,
    *,
    exclude_self: bool = False,
    bilateral_impl: str = "pallas",  # "pallas" | "reference"
    unary_clip: float = 1e-5,
    bilateral_subsample: int = 1,
    bilateral_mode: str = "strided",  # "strided" | "nystrom"
    nystrom_ridge: float = 1e-2,
    xy_scale=1.0,
    materialize_kernel: "bool | None" = None,
    fused_iteration: "bool | None" = None,
    kt_quantize: "bool | None" = None,
) -> jax.Array:
    """Mean-field inference for V unary variants over ONE image at once;
    returns label maps [V, H, W] int32.

    The pipeline runs the CRF twice per image (round-0 and aggregated
    variants, same RGB). The kernels, degrees and anchor inverse depend
    only on the image, and the fused bilateral matmul pads its value
    lanes to 128 anyway (C ~ 29), so stacking the variants' channels into
    one [N, V*C] value matrix makes V=2 cost the SAME bilateral work as
    V=1 — the softmax is simply applied per C-sized block.

    ``bilateral_subsample`` s > 1 restricts the bilateral message support
    to a strided pixel subset (every s-th pixel in x and y). Two modes:

    - "strided": quadrature — m = K_rect @ (n q) over the subset only.
      The Gaussian kernel is smooth in feature space so the strided sum
      approximates the full one at 1/s^2 the cost; colours that never
      land on a grid point are unrepresented.
    - "nystrom": low-rank reconstruction through the same grid anchors —
      K ~= K_NA (K_AA + ridge I)^-1 K_AN. Every pixel's q contributes
      (K_AN touches all N), so off-anchor colours are represented; cost
      is 2 fused kernel matmuls per iteration (2*N*M exps vs the strided
      N*M), making nystrom at stride s comparable to strided at s/sqrt(2)
      in work but closer to exact in message quality.

    ``xy_scale`` (float / traced scalar / shape-[2] ``(sx, sy)``)
    multiplies the spatial standard deviations. The reference runs the CRF
    at ground-truth resolution with pixel-unit constants (POS_XY_STD=3,
    Bi_XY_STD=50, driver :1036-1041); at a fixed bucket resolution the
    same pixel counts reach ~2x further relative to the image, silently
    changing the smoothing strength. The runner passes per-axis
    xy_scale = (bucket / gt_w, bucket / gt_h) so the kernels match the
    reference's RELATIVE reach per image along BOTH axes — the square
    bucket resize is anisotropic for non-square images, so a single
    isotropic scale (the round-2 scheme, bucket / max(gt_h, gt_w)) left
    the shorter axis under-reaching by the aspect ratio (~33% at 4:3).
    A scalar still broadcasts to both axes.
    (Measured on the synthetic postprocess gate: the UNscaled bucket CRF
    drifts several mIoU points from the exact-GT-resolution anchor.)

    ``kt_quantize`` stores the materialised kernel as uint8
    (round(k * 255); the dequant scale rides the normaliser fold),
    halving the bandwidth-bound per-iteration kernel read. Only applies
    to the materialised strided path; None reads the PNP_CRF_KT_Q env
    override and defaults to True (round-4 TPU A/B: the combined
    bandwidth knobs took the full pipeline 55.0 -> 60.4 img/s and the
    5-seed synthetic gate with them on is statistically identical to
    off — mean +1.32 vs +1.37 pts over the host anchor; PNP_CRF_KT_Q=0
    restores the unquantised kernel).
    """
    v, c, h, w = logits.shape
    n = h * w

    q0 = jax.nn.softmax(logits.astype(jnp.float32), axis=1)
    u = -jnp.log(jnp.clip(q0, unary_clip, 1.0))  # [V, C, H, W]
    # [V*C, N] layout: channel blocks on the SUBLANE axis (58 -> 64 pad),
    # the full-width pixel axis on the LANES (N is a multiple of 128).
    # The transposed layout [N, V*C] pads 58 channel lanes to 128 in every
    # elementwise op, softmax AND the per-iteration kernel matmul — a
    # ~2.2x VPU/MXU issue-slot waste across the whole loop.
    u_flat = u.reshape(v * c, n)

    scale_xy = jnp.broadcast_to(
        jnp.asarray(xy_scale, jnp.float32).reshape(-1), (2,)
    )  # [sx, sy]
    pos_xy_std = cfg.pos_xy_std * scale_xy[::-1]  # (sigma_y, sigma_x)
    feats_bi = bilateral_features(
        image_rgb, cfg.bi_xy_std * scale_xy, cfg.bi_rgb_std,
    )

    s = bilateral_subsample
    if s > 1:
        hs, ws = -(-h // s), -(-w // s)
        grid_idx = (
            (jnp.arange(hs) * s)[:, None] * w + (jnp.arange(ws) * s)[None, :]
        ).reshape(-1)
        feats_bi_j = feats_bi[grid_idx]

        # The subset is a REGULAR stride (every s-th pixel per axis), so
        # express it as strided slices over the [.., H, W] view instead of
        # an indexed gather. Measured perf-neutral vs the gather at
        # 192/s=4 (XLA already handled the constant-index gather well);
        # kept because it drops the [M] index constant and states the
        # structure directly.
        def take_j(x):  # [N, C] -> [M, C]
            c = x.shape[-1]
            return x.reshape(h, w, c)[::s, ::s].reshape(-1, c)

        def take_j_cols(x):  # [C', N] -> [C', M]
            c = x.shape[0]
            return x.reshape(c, h, w)[:, ::s, ::s].reshape(c, -1)
    else:
        feats_bi_j = feats_bi

        def take_j(x):
            return x

        def take_j_cols(x):
            return x

    if bilateral_impl == "pallas":
        def kernel_matmul(fi, v, fj=None):
            return gaussian_kernel_matmul(fi, v, fj)
    else:
        def kernel_matmul(fi, v, fj=None):
            return gaussian_kernel_matmul_reference(
                fi, v, fj if fj is not None else None
            )

    # Strided mode with a modest anchor count: materialise the [N, M]
    # kernel ONCE (bf16, e.g. 315 MB at 224px/s=4) and amortise the exp
    # evaluations over all mean-field iterations — each iteration is then
    # a pure MXU matmul instead of N*M VPU exps. d2 via the f32 expansion
    # is safe here (values ~1e2, f32 eps 1e-7; it was the *bf16* expansion
    # that broke the nystrom Gram matrix), but the matmul must run at
    # HIGHEST precision so the MXU does not truncate the operands.
    if materialize_kernel is None:
        # The Pallas build never materialises the f32 d2 intermediate
        # (only the bf16 kernel exists), so it can afford a higher
        # element limit: s=2 at bucket 224 (6.3e8) now materialises and
        # runs each iteration at MXU rate instead of re-evaluating N*M
        # exps (~2x the CRF cost on the on-the-fly path, measured).
        limit = 7e8 if bilateral_impl == "pallas" else 5e8
        materialize_kernel = (
            bilateral_mode == "strided" and s > 1
            and n * (-(-h // s)) * (-(-w // s)) <= limit
        )

    use_nystrom = bilateral_mode == "nystrom" and s > 1
    fused = False
    if materialize_kernel and not use_nystrom and s > 1:
        # Materialise the TRANSPOSED kernel K^T [M, N] and run each
        # iteration as v^T [C', M] @ K^T — the output is [C', N] with the
        # full-width pixel axis on the MXU lanes (N is a multiple of 128)
        # and the C' ~ 58 channel axis on sublanes (58 -> 64, 1.1x pad).
        # The untransposed form K [N, M] @ v [M, C'] pads C' onto the
        # LANES (58 -> 128, 2.2x pad), wasting over half the MXU issue
        # slots of the dominant per-iteration matmul. Same math, same
        # exps; the per-iteration [C', N] transpose back is ~13 MB of
        # bandwidth — noise against the N*M matmul.
        # bf16 operands ride the MXU at 2x rate on TPU; the CPU backend
        # (tests) has no bf16 dot thunk, so it keeps f32 operands.
        mm_dtype = (jnp.float32 if jax.default_backend() == "cpu"
                    else jnp.bfloat16)
        # uint8 kernel storage (round(k * 255), k in [0, 1]): halves the
        # dominant per-iteration kernel read (the N*M matmul is
        # bandwidth-bound ~4:1 at 192px/s4). The 1/255 fold rides the
        # per-column normaliser; quantisation noise is ~5e-4 relative in
        # the energies (entries O(1) summed to degree ~1e2 wash it out).
        if kt_quantize is None:
            env = os.environ.get("PNP_CRF_KT_Q")  # A/B debug override
            kt_quantize = (env not in ("0", "false", "")) if env is not None \
                else True
        kt_inv_scale = (
            1.0 / bilateral_pallas.KT_QUANT_SCALE if kt_quantize else 1.0
        )
        # Fused mean-field iteration (bilateral matmul + energy +
        # blockwise softmax in ONE Pallas kernel): eliminates the
        # separate [V*C, N] f32 elementwise/softmax passes between the
        # kernel matmul and the next state (~4 ms of the 15.4 ms/iter
        # CRF cost at 192px/s4/B35). Auto when both variants' channels
        # fit the 64-row packing and the default include-self semantics
        # apply; the unfused loop remains the general path.
        fused = fused_iteration
        fused_source = "kwarg" if fused is not None else None
        if fused is None:
            env = os.environ.get("PNP_CRF_FUSED")  # A/B debug override
            if env is not None:
                fused = env not in ("0", "false", "")
                fused_source = "env"
            else:
                fused = (
                    bilateral_impl == "pallas" and not exclude_self
                    and v * c <= 64 and n % 128 == 0
                )
        if bilateral_impl == "pallas":
            # Fused d2+exp+store build: the jnp expansion writes the
            # [M, N] f32 d2 intermediate to HBM before the exp (XLA does
            # not fuse elementwise consumers past dot outputs on TPU);
            # the Pallas build keeps each tile in VMEM and writes only
            # the bf16 kernel — ~5x less build traffic. Row-padded
            # ([M_pad, N], exact-zero pad rows) so the per-iteration
            # matmul needs no slice copy; the j-side operands are
            # zero-padded to match.
            kt_mat = gaussian_kernel_materialize(
                feats_bi_j, feats_bi,
                out_dtype=jnp.uint8 if kt_quantize else mm_dtype,
                keep_padded_rows=True,
            )
        else:
            # f32 ||a||^2+||b||^2-2ab expansion is cancellation-safe at
            # these magnitudes (it was the *bf16* expansion that broke
            # the nystrom Gram matrix), but the matmul must run HIGHEST
            # so the MXU does not truncate the operands.
            x2 = jnp.sum(feats_bi * feats_bi, axis=-1)
            d2 = (
                x2[grid_idx][:, None]
                + x2[None, :]
                - 2.0 * jnp.dot(feats_bi_j, feats_bi.T,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
            )
            k_full = jnp.exp(-0.5 * jnp.maximum(d2, 0.0))
            kt_mat = (
                jnp.round(k_full * bilateral_pallas.KT_QUANT_SCALE)
                .astype(jnp.uint8)
                if kt_quantize else k_full.astype(mm_dtype)
            )
        m_pad = kt_mat.shape[0]

        # Forcing fused on (kwarg or PNP_CRF_FUSED=1) must not bypass the
        # auto-gate's prerequisites: exclude_self has no fused correction
        # (silently different labels), v*c > 64 breaks the row packing,
        # and a non-128-multiple M/N violates crf_fused_iteration's
        # documented caller guarantee (ADVICE r3 medium #2). Explicit
        # kwarg -> hard error; env A/B override -> warn and fall back so
        # a global PNP_CRF_FUSED=1 sweep still runs the other configs.
        if fused and fused_source is not None:
            problems = []
            if exclude_self:
                problems.append("exclude_self=True (the fused kernel "
                                "keeps the self term)")
            if v * c > 64:
                problems.append(f"v*c={v * c} > 64 row-packing limit")
            if n % 128 != 0:
                problems.append(f"N={n} not a multiple of 128")
            if m_pad % 128 != 0:
                problems.append(
                    f"M={m_pad} not 128-aligned (bilateral_impl="
                    f"{bilateral_impl!r} builds an unpadded kernel)")
            if problems:
                msg = ("fused CRF iteration requested but unusable: "
                       + "; ".join(problems))
                if fused_source == "kwarg":
                    raise ValueError(msg)
                import warnings

                warnings.warn(msg + " — falling back to the unfused loop",
                              stacklevel=2)
                fused = False

        def take_j_pad(q_cn):  # [C', N] -> [C', M_pad] f32
            qs = take_j_cols(q_cn)
            if m_pad != qs.shape[1]:
                qs = jnp.pad(qs, ((0, 0), (0, m_pad - qs.shape[1])))
            return qs

        def bilateral_apply(q_cn):  # [C', N] -> [C', N], no transposes
            y = jnp.dot(
                take_j_pad(q_cn).astype(mm_dtype),
                kt_mat.astype(mm_dtype) if kt_quantize else kt_mat,
                preferred_element_type=jnp.float32,
            )
            return y * kt_inv_scale if kt_quantize else y
    elif use_nystrom:
        # Anchor Gram matrix (M x M, M ~ (H/s)(W/s): small) + ridge, solved
        # by Cholesky once; each iteration applies K_NA chol_solve(K_AN .).
        #
        # d2 MUST come from explicit pairwise differences, NOT the
        # ||a||^2 + ||b||^2 - 2 a.b expansion: adjacent anchors are a
        # fraction of a std apart, the expansion cancels two ~1e2-sized
        # terms, and on TPU the 2 fa@fa.T matmul truncates to bf16 —
        # the resulting K_AA is not even PSD and Cholesky returns NaN
        # (this exact failure shipped as 0%-agreement labels at 224px
        # before the explicit form below pinned it).
        fa = feats_bi_j
        diff = fa[:, None, :] - fa[None, :, :]  # [M, M, 5] exact f32
        d2 = jnp.sum(diff * diff, axis=-1)
        k_aa = jnp.exp(-0.5 * d2)
        m_a = k_aa.shape[0]
        # Materialise (K_AA + ridge I)^-1 ONCE: TPU triangular solves are
        # row-sequential and slow, so one M-rhs solve beats a per-iteration
        # C-rhs solve by ~the iteration count; afterwards each application
        # is a plain MXU matmul. K_AA is ill-conditioned (nearby anchors
        # are near-duplicates), so the factorisation and the per-iteration
        # projection both run at HIGHEST matmul precision — their FLOPs
        # are noise next to the N*M kernel matmuls.
        chol = jax.scipy.linalg.cho_factor(
            k_aa + nystrom_ridge * jnp.eye(m_a, dtype=jnp.float32)
        )
        k_aa_inv = jax.scipy.linalg.cho_solve(
            chol, jnp.eye(m_a, dtype=jnp.float32)
        )

        def bilateral_apply(q_cn):  # [C', N] -> [C', N]
            # Non-default path: the lattice-style matmuls take row-major
            # [rows, C] values, so transpose at the boundary (~13 MB/iter
            # of bandwidth — noise next to the kernel work).
            y = kernel_matmul(fa, q_cn.T, feats_bi)  # K_AN @ v
            z = jnp.dot(k_aa_inv, y, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
            return kernel_matmul(feats_bi, z, fa).T  # K_NA @ z
    else:
        def bilateral_apply(q_cn):  # [C', N] -> [C', N]
            return kernel_matmul(
                feats_bi, take_j(q_cn.T), feats_bi_j
            ).T

    if fused_iteration and not fused:
        raise ValueError(
            "fused_iteration=True requires the materialised strided "
            "bilateral path (bilateral_mode='strided', subsample > 1, "
            "materialize_kernel) — this call resolved to "
            f"mode={bilateral_mode!r}, subsample={s}, "
            f"materialize_kernel={bool(materialize_kernel)}")
    if not fused and fused_iteration is None and not (
            materialize_kernel and not use_nystrom and s > 1):
        # (The materialised-but-unusable case already warned above.)
        env = os.environ.get("PNP_CRF_FUSED")
        if env is not None and env not in ("0", "false", ""):
            # The env A/B override only takes effect on the materialised
            # strided path; say so instead of letting a sweep attribute
            # an unfused leg's numbers to the fused kernel.
            import warnings

            warnings.warn(
                "PNP_CRF_FUSED=1 ignored: this config "
                f"(mode={bilateral_mode!r}, subsample={s}, "
                f"materialize_kernel={bool(materialize_kernel)}) has no "
                "fused path — running the unfused loop", stacklevel=2)

    # Degrees / symmetric normalisers (constant across iterations).
    deg_bi = bilateral_apply(jnp.ones((1, n), jnp.float32))  # [1, N]
    if exclude_self:
        deg_bi = deg_bi - 1.0
    norm_bi = jax.lax.rsqrt(jnp.maximum(deg_bi, 1e-20))

    deg_sp = spatial_gaussian_apply(jnp.ones((h, w), jnp.float32),
                                    pos_xy_std)
    if exclude_self:
        deg_sp = deg_sp - 1.0
    norm_sp = jax.lax.rsqrt(jnp.maximum(deg_sp, 1e-20))  # [H, W]

    def spatial_apply_flat(q_cn):  # [C', N] -> [C', N]
        out = spatial_gaussian_apply(q_cn.reshape(v * c, h, w), pos_xy_std)
        return out.reshape(v * c, n)

    norm_sp_flat = norm_sp.reshape(1, n)

    if fused:
        # Whole-iteration fused path: state is carried row-padded
        # [R, N] (R = V*C rounded to sublanes, pad rows exactly zero —
        # the in-kernel softmax mask keeps them zero, the spatial
        # einsums and unary pads preserve it). Per iteration, XLA runs
        # only the spatial einsums and the tiny [R, M] subset prep; the
        # bilateral matmul, symmetric norms, unary energy and the
        # per-variant softmax all happen in VMEM (crf_fused_iteration).
        r_rows = -(-(v * c) // 16) * 16
        pad_r = r_rows - v * c
        # bf16 state (default; PNP_CRF_STATE=f32 opts out): the carried
        # Q, the constant -U and the spatial message stream at half
        # width; energies and the softmax still run f32 in VMEM. Q holds
        # probabilities in [0, 1] and U is O(10) log-space, so the
        # rounding noise is the same order as the uint8 kernel
        # quantisation — gate-checked (round-4 5-seed TPU gate).
        state_dtype = (
            jnp.bfloat16
            if os.environ.get("PNP_CRF_STATE", "bf16").lower()
            in ("bf16", "bfloat16")
            else jnp.float32
        )
        u_neg = jnp.pad(-u_flat, ((0, pad_r), (0, 0))).astype(state_dtype)
        # The fused kernel's dot consumes the raw stored kernel, so the
        # uint8 dequant scale folds into nb here (norm_bi itself came
        # through bilateral_apply, which already descaled).
        nb = jnp.broadcast_to(cfg.bi_w * kt_inv_scale * norm_bi, (8, n))
        norm_j = take_j_pad(norm_bi)  # [1, M_pad]

        if os.environ.get("PNP_CRF_FOLD", "1") not in ("0", "false", ""):
            # Exact rank-1 normaliser fold: the separable kernel's degree
            # is the outer product (kh@1)(kw@1)^T, so
            #   n ⊙ K(n ⊙ q) == (Dh kh Dh) Q (Dw kw Dw),
            # Dh = diag(rsqrt(kh@1)), Dw likewise — the two full-state
            # [R, N] elementwise passes per iteration fold into the band
            # matrices ONCE per image (pure algebra; float-assoc only).
            # Valid because fused implies exclude_self=False (the -1 on
            # the degree would break the rank-1 structure).
            kh_m, kw_m = spatial_band_matrices(h, w, pos_xy_std)
            nh = jax.lax.rsqrt(jnp.maximum(kh_m.sum(1), 1e-20))
            nw = jax.lax.rsqrt(jnp.maximum(kw_m.sum(1), 1e-20))
            khp = nh[:, None] * kh_m * nh[None, :]
            kwp = nw[:, None] * kw_m * nw[None, :]

            def spatial_msg(q_rn):
                out = _apply_separable(khp, kwp, q_rn.reshape(r_rows, h, w))
                return cfg.pos_w * out.reshape(r_rows, n)
        else:
            def spatial_msg(q_rn):
                nsq = (norm_sp_flat * q_rn).reshape(r_rows, h, w)
                return cfg.pos_w * (
                    norm_sp_flat
                    * spatial_gaussian_apply(nsq, pos_xy_std)
                    .reshape(r_rows, n)
                )

        def body_fused(_, q_rn):
            msp = spatial_msg(q_rn).astype(state_dtype)
            qsub = take_j_pad(q_rn) * norm_j  # bf16*f32 promotes to f32
            return crf_fused_iteration(
                qsub.astype(mm_dtype), kt_mat, u_neg, msp, nb, v=v, c=c,
                out_dtype=state_dtype,
            )

        q0_pad = jnp.pad(q0.reshape(v * c, n), ((0, pad_r), (0, 0)))
        q = jax.lax.fori_loop(0, cfg.num_iters, body_fused,
                              q0_pad.astype(state_dtype))[:v * c]
        labels = jnp.argmax(q.reshape(v, c, n), axis=1).astype(jnp.int32)
        return labels.reshape(v, h, w)

    def body(_, q_cn):
        # Bilateral: n_i * K~(n_j * q_j) where K~ is the exact rectangular
        # kernel (strided) or the Nystrom reconstruction.
        m_bi = norm_bi * bilateral_apply(norm_bi * q_cn)
        if exclude_self:
            m_bi = m_bi - (norm_bi * norm_bi) * q_cn
        m_sp = _normalised_apply(
            spatial_apply_flat, q_cn, norm_sp_flat, exclude_self
        )
        energy = -u_flat + cfg.bi_w * m_bi + cfg.pos_w * m_sp
        # Mean-field softmax runs per variant block: reduce over the
        # channel axis (sublanes) with the pixel axis dense on lanes.
        energy = energy.reshape(v, c, n)
        return jax.nn.softmax(energy, axis=1).reshape(v * c, n)

    q = jax.lax.fori_loop(0, cfg.num_iters, body, q0.reshape(v * c, n))
    labels = jnp.argmax(q.reshape(v, c, n), axis=1).astype(jnp.int32)
    return labels.reshape(v, h, w)
