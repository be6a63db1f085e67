"""Fused ViT block path (ops/vit_block_pallas.py) vs the unfused chain.

The fused path changes op grouping only (LN1+qkv one kernel, LN2+MLP one
kernel, whole-encode padded layout) — same math, different float-op
ordering. These tests pin:

1. param-tree equality between the fused and unfused scans (the
   converter / partition specs must see no difference),
2. forward agreement at f32 on CPU (interpret-mode kernels),
3. padded-row isolation: extending the pad must not change real rows,
4. the single-branch polynomial erf against lax.erf.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnp_ovss_tpu.config import ViTConfig
from pnp_ovss_tpu.models.vit import VisionTransformer
from pnp_ovss_tpu.ops.vit_block_pallas import (
    _erf_f32,
    ln_matmul,
    ln_mlp_residual,
)

# Smallest fused-eligible config: d=128 (lane multiple), 2 heads of 64
# (flat kernel head pair), 192px -> 145 tokens (>= 128).
CFG = ViTConfig(image_size=192, patch_size=16, hidden_size=128,
                num_layers=2, num_heads=2, dtype="float32")


def _params_and_image():
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 192, 192, 3), jnp.float32)
    model = VisionTransformer(CFG, impl="pallas")
    params = model.init(jax.random.PRNGKey(1), images)
    return model, params, images


def test_fused_param_tree_matches_unfused():
    _, params, images = _params_and_image()
    model_x = VisionTransformer(CFG, impl="xla")
    params_x = model_x.init(jax.random.PRNGKey(1), images)
    fa = jax.tree_util.tree_flatten_with_path(params)[0]
    fb = jax.tree_util.tree_flatten_with_path(params_x)[0]
    assert [k for k, _ in fa] == [k for k, _ in fb]
    for (k, a), (_, b) in zip(fa, fb):
        assert a.shape == b.shape, (k, a.shape, b.shape)
        # Same param paths fold the same rngs: identical init draws.
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_forward_matches_unfused_f32():
    model, params, images = _params_and_image()
    out_f = jax.jit(model.apply)(params, images)
    model_x = VisionTransformer(CFG, impl="xla")
    out_x = jax.jit(model_x.apply)(params, images)
    a, b = np.asarray(out_f, np.float32), np.asarray(out_x, np.float32)
    assert a.shape == b.shape == (2, CFG.seq_len, 128)
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_fused_disabled_by_env(monkeypatch):
    model, params, images = _params_and_image()
    out_f = jax.jit(model.apply)(params, images)
    monkeypatch.setenv("PNP_VIT_FUSED", "0")
    out_off = model.apply(params, images)  # unjitted: re-traces with env
    np.testing.assert_allclose(
        np.asarray(out_f, np.float32), np.asarray(out_off, np.float32),
        rtol=2e-4, atol=2e-4,
    )


def test_proj_fold_encode_matches_default(monkeypatch):
    """PNP_FLASH_PROJ=1 (attention+proj+residual in one kernel) must not
    change the encode: at this config the auto head group is hb == h
    (nhg=1), where the proj contraction is a single full-depth dot with
    the same value flow as the unfused `flash -> dot + bias + residual`
    chain — bit-identical output (op-level pin:
    test_flash_qkv_proj_matches_unfused_chain)."""
    model, params, images = _params_and_image()
    out_def = model.apply(params, images)
    monkeypatch.setenv("PNP_FLASH_PROJ", "1")
    out_proj = model.apply(params, images)  # unjitted: re-traces with env
    np.testing.assert_array_equal(
        np.asarray(out_def, np.float32), np.asarray(out_proj, np.float32))


def test_ln_matmul_matches_reference():
    rng = np.random.RandomState(3)
    m, d, n = 300, 128, 384  # non-block-multiple rows
    x = jnp.asarray(rng.randn(m, d), jnp.float32)
    g = jnp.asarray(1 + 0.1 * rng.randn(d), jnp.float32)
    b = jnp.asarray(0.1 * rng.randn(d), jnp.float32)
    w = jnp.asarray(rng.randn(d, n) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.randn(n) * 0.05, jnp.float32)
    got = np.asarray(ln_matmul(x, g, b, w, bias, out_dtype=jnp.float32))

    xf = np.asarray(x)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    h = (xf - mu) / np.sqrt(var + 1e-6) * np.asarray(g) + np.asarray(b)
    want = h @ np.asarray(w) + np.asarray(bias)
    assert got.shape == (m, n)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_ln_mlp_residual_matches_reference():
    rng = np.random.RandomState(4)
    m, d, f = 520, 128, 512
    x = jnp.asarray(rng.randn(m, d), jnp.float32)
    g = jnp.asarray(1 + 0.1 * rng.randn(d), jnp.float32)
    b = jnp.asarray(0.1 * rng.randn(d), jnp.float32)
    w1 = jnp.asarray(rng.randn(d, f) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.randn(f) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.randn(f, d) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.randn(d) * 0.05, jnp.float32)
    got = np.asarray(ln_mlp_residual(x, g, b, w1, b1, w2, b2,
                                     out_dtype=jnp.float32))

    xf = np.asarray(x)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    h = (xf - mu) / np.sqrt(var + 1e-6) * np.asarray(g) + np.asarray(b)
    y = h @ np.asarray(w1) + np.asarray(b1)
    gelu = np.asarray(
        jax.nn.gelu(jnp.asarray(y), approximate=False), np.float32)
    want = xf + gelu @ np.asarray(w2) + np.asarray(b2)
    assert got.shape == (m, d)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_pick_bm_policy():
    """The MLP row-block target is 784, calibrated by the round-5 batch
    sweep: bm=896 compiled to a 16.67 MB scoped-VMEM stack (over the
    16 MB limit) at M=17920/25088 while production B=35 (M=15680, not
    896-divisible) always descended to 784. Every production M must
    resolve to its known-good block."""
    from pnp_ovss_tpu.ops.vit_block_pallas import _pick_bm

    assert _pick_bm(15680, 784) == 784   # B=35 x s_pad 448 (production)
    assert _pick_bm(18816, 784) == 784   # B=42 x 448 (best sweep leg)
    assert _pick_bm(17920, 784) == 640   # B=40 x 448 (896 OOM'd here)
    assert _pick_bm(21952, 784) == 784   # B=49 x 448
    assert _pick_bm(27840, 784) == 696   # B=12 x 2320 (768px default;
    # the old 896 target also descended to 696 — no production change)
    assert _pick_bm(520, 784) == 520     # m < target -> whole rows


def test_erf_polynomial_accuracy():
    """Single-branch clamped erf: <= 1.1e-6 abs inside |x| <= 2.2; the
    clamp beyond agrees with erf at bf16 output precision (erf rounds to
    1.0 for x >= 2.19 and P(2.2^2)*2.2 = 0.998137 also rounds to 1.0)."""
    xs = jnp.asarray(np.linspace(-6, 6, 20001), jnp.float32)
    got = np.asarray(_erf_f32(xs))
    want = np.asarray(jax.lax.erf(xs))
    inner = np.abs(np.asarray(xs)) <= 2.2
    assert np.abs(got[inner] - want[inner]).max() < 1.5e-6
    outer = ~inner
    got16 = np.asarray(jnp.asarray(got[outer]).astype(jnp.bfloat16),
                       np.float32)
    want16 = np.asarray(jnp.asarray(want[outer]).astype(jnp.bfloat16),
                        np.float32)
    np.testing.assert_array_equal(got16, want16)


def test_erf_full_f32_tail_accuracy():
    """ADVICE r3 low #3: the f32 (non-bf16) gelu path must not carry the
    bf16 clamp's ~2e-3 tail error; the erfc tail branch keeps the full
    range within the poly's own 1e-6 fit accuracy of lax.erf (the tail
    branch itself is <= 3e-7; the core poly's f32 Horner peaks ~8e-7
    near the 2.2 seam)."""
    from pnp_ovss_tpu.ops.vit_block_pallas import _erf_f32_full

    xs = jnp.asarray(np.linspace(-8, 8, 40001), jnp.float32)
    got = np.asarray(_erf_f32_full(xs))
    want = np.asarray(jax.lax.erf(xs))
    assert np.abs(got - want).max() < 1.5e-6
    tail = np.abs(np.asarray(xs)) > 2.2
    assert np.abs(got[tail] - want[tail]).max() < 4e-7


def test_gelu_f32_tail_matches_jax():
    """gelu at f32 output with activations beyond the bf16 clamp zone
    (|y| in 3..8) must match jax.nn.gelu to f32 accuracy, not 2e-3."""
    from pnp_ovss_tpu.ops.vit_block_pallas import _gelu_exact

    ys = jnp.asarray(
        np.concatenate([np.linspace(-8, 8, 8001),
                        np.linspace(2.9, 3.5, 2001)]), jnp.float32)
    got = np.asarray(_gelu_exact(ys))
    want = np.asarray(jax.nn.gelu(ys, approximate=False))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


def test_ln_mlp_residual_ragged_f_raises():
    """ADVICE r3 medium #1: F not a 128-multiple must raise, never
    silently drop the tail hidden channels."""
    from pnp_ovss_tpu.ops import vit_block_pallas as vbp

    m, d, f = 16, 128, 448  # d * mlp_ratio 3.5 -> ragged F
    args = [jnp.zeros((m, d)), jnp.ones(d), jnp.zeros(d),
            jnp.zeros((d, f)), jnp.zeros(f), jnp.zeros((f, d)),
            jnp.zeros(d)]
    with pytest.raises(ValueError, match="multiple of 128"):
        ln_mlp_residual(*args, out_dtype=jnp.float32)
    assert not vbp.supported(d, 3 * d, mlp_hidden=f)
    assert vbp.supported(d, 3 * d, mlp_hidden=512)
