"""Numeric-op tests vs scipy/torch oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnp_ovss_tpu.ops.blur import blur_and_minmax, gaussian_blur2d
from pnp_ovss_tpu.ops.resize import resize_bilinear_align_corners
from pnp_ovss_tpu.ops.segment_pool import pool_token_maps
from pnp_ovss_tpu.ops import attention as attn_ops


def test_gaussian_blur_matches_scipy():
    from scipy.ndimage import gaussian_filter

    rng = np.random.RandomState(0)
    x = rng.rand(17, 23).astype(np.float32)
    for sigma in (0.8, 2.5, 5.0):
        want = gaussian_filter(x, sigma)
        got = np.asarray(gaussian_blur2d(jnp.asarray(x), sigma))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_blur_and_minmax_range():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(3, 17, 19), jnp.float32)
    y = np.asarray(blur_and_minmax(x, 1.5))
    assert y.min() >= 0 and y.max() <= 1 + 1e-6
    for c in range(3):
        assert y[c].min() == pytest.approx(0.0, abs=1e-6)
        assert y[c].max() == pytest.approx(1.0, abs=1e-6)


def test_resize_matches_torch_align_corners():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(2)
    x = rng.rand(2, 3, 7, 9).astype(np.float32)
    want = F.interpolate(
        torch.tensor(x), size=(20, 31), mode="bilinear", align_corners=True
    ).numpy()
    got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), 20, 31))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_resize_downscale_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(3)
    x = rng.rand(1, 2, 21, 21).astype(np.float32)
    want = F.interpolate(
        torch.tensor(x), size=(9, 13), mode="bilinear", align_corners=True
    ).numpy()
    got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), 9, 13))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pool_token_maps_wordpiece_mean():
    """Pooling matrix reproduces the reference's '##' averaging loop."""
    b, t1, g = 1, 10, 3
    rng = np.random.RandomState(4)
    gc = rng.rand(b, t1, g, g).astype(np.float32)
    # Two classes: rows 3 (single piece) and rows 4-6 (three pieces).
    pool = np.zeros((b, 2, t1), np.float32)
    pool[0, 0, 3] = 1.0
    pool[0, 1, 4:7] = 1.0 / 3
    out = np.asarray(pool_token_maps(jnp.asarray(pool), jnp.asarray(gc)))
    np.testing.assert_allclose(out[0, 0], gc[0, 3], rtol=1e-6)
    np.testing.assert_allclose(
        out[0, 1], gc[0, 4:7].mean(axis=0), rtol=1e-5, atol=1e-6
    )


def test_mha_xla_matches_naive():
    rng = np.random.RandomState(5)
    q = jnp.asarray(rng.randn(2, 3, 8, 4), jnp.float32)
    k = jnp.asarray(rng.randn(2, 3, 8, 4), jnp.float32)
    v = jnp.asarray(rng.randn(2, 3, 8, 4), jnp.float32)
    got = np.asarray(attn_ops.mha_xla(q, k, v))
    s = np.einsum("bhqd,bhkd->bhqk", q, k) / 2.0
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = np.einsum("bhqk,bhkd->bhqd", p, v)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_flash_attention_matches_xla():
    from pnp_ovss_tpu.ops.flash_attention import flash_mha, supported

    rng = np.random.RandomState(6)
    q = jnp.asarray(rng.randn(2, 2, 300, 64), jnp.float32)
    k = jnp.asarray(rng.randn(2, 2, 300, 64), jnp.float32)
    v = jnp.asarray(rng.randn(2, 2, 300, 64), jnp.float32)
    assert supported(q)
    want = np.asarray(attn_ops.mha_xla(q, k, v))
    got = np.asarray(flash_mha(q, k, v))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_flash_mha_flat_matches_xla():
    """Fused flat-layout kernel (q/k/v as [B, S, H*D] head-major slices,
    true length 443 < padded 512) == transposed XLA attention."""
    from pnp_ovss_tpu.ops.flash_attention import (
        flash_mha_flat, flat_supported,
    )

    rng = np.random.RandomState(7)
    b, s, h, d = 2, 443, 4, 64
    q2 = jnp.asarray(rng.randn(b, s, h * d), jnp.float32)
    k2 = jnp.asarray(rng.randn(b, s, h * d), jnp.float32)
    v2 = jnp.asarray(rng.randn(b, s, h * d), jnp.float32)
    assert flat_supported(s, h, d)
    got = np.asarray(flash_mha_flat(q2, k2, v2, num_heads=h))

    def split(x):  # [B, S, H*D] -> [B, H, S, D]
        return jnp.transpose(x.reshape(b, s, h, d), (0, 2, 1, 3))

    want_t = attn_ops.mha_xla(split(q2), split(k2), split(v2))
    want = np.asarray(
        jnp.transpose(want_t, (0, 2, 1, 3)).reshape(b, s, h * d)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_flash_mha_flat_batch_group_matches_xla():
    """Batch-grouped program path (b=5 -> bb=5, the production B=35
    grouping in miniature; odd group so sublane alignment is exercised)
    == transposed XLA attention."""
    from pnp_ovss_tpu.ops.flash_attention import (
        flash_mha_flat, flat_supported,
    )

    rng = np.random.RandomState(11)
    b, s, h, d = 5, 443, 2, 64
    q2 = jnp.asarray(rng.randn(b, s, h * d), jnp.float32)
    k2 = jnp.asarray(rng.randn(b, s, h * d), jnp.float32)
    v2 = jnp.asarray(rng.randn(b, s, h * d), jnp.float32)
    assert flat_supported(s, h, d)
    got = np.asarray(flash_mha_flat(q2, k2, v2, num_heads=h, true_len=s))

    def split(x):
        return jnp.transpose(x.reshape(b, s, h, d), (0, 2, 1, 3))

    want = np.asarray(jnp.transpose(
        attn_ops.mha_xla(split(q2), split(k2), split(v2)), (0, 2, 1, 3)
    ).reshape(b, s, h * d))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_flash_mha_flat_batch_group7_matches_xla():
    """b=7 -> bb=7, the round-5 production grouping (B=35 splits 5x7;
    the auto now prefers the larger divisor — TPU A/B 63.8 vs 61.1
    img/s). Parity vs transposed XLA attention on the grouped path."""
    from pnp_ovss_tpu.ops.flash_attention import (
        flash_mha_flat, _pick_batch_group,
    )

    rng = np.random.RandomState(13)
    b, s, h, d = 7, 443, 2, 64
    assert _pick_batch_group(b, 448, h * d) == 7
    q2 = jnp.asarray(rng.randn(b, s, h * d), jnp.float32)
    k2 = jnp.asarray(rng.randn(b, s, h * d), jnp.float32)
    v2 = jnp.asarray(rng.randn(b, s, h * d), jnp.float32)
    got = np.asarray(flash_mha_flat(q2, k2, v2, num_heads=h, true_len=s))

    def split(x):
        return jnp.transpose(x.reshape(b, s, h, d), (0, 2, 1, 3))

    want = np.asarray(jnp.transpose(
        attn_ops.mha_xla(split(q2), split(k2), split(v2)), (0, 2, 1, 3)
    ).reshape(b, s, h * d))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_pick_batch_group_policy(monkeypatch):
    """The auto policy: largest divisor <= 8 under the 7 MB io-block
    estimate; bb=1 for multi-k-block sequences; env force wins.

    The 7 MB cap is calibrated to the chip: bb=8 at s_pad 448 (estimate
    7.34 MB) compiled to a 16.29 MB scoped-VMEM stack — 300 KB OVER the
    16 MB limit (round-5 B=40 bench leg failed to compile) — while bb=7
    (6.42 MB) runs in production. bb=8 must therefore be rejected."""
    from pnp_ovss_tpu.ops.flash_attention import _pick_batch_group

    monkeypatch.delenv("PNP_FLASH_BB", raising=False)
    assert _pick_batch_group(35, 448, 128) == 7   # 35 = 5*7, prefer 7
    assert _pick_batch_group(8, 448, 128) == 4    # bb=8 OOMs scoped VMEM
    assert _pick_batch_group(40, 448, 128) == 5   # 8 rejected -> 5
    assert _pick_batch_group(48, 448, 128) == 6   # 8 rejected -> 6
    assert _pick_batch_group(70, 448, 128) == 7   # 70: 8,7 divisor walk
    assert _pick_batch_group(35, 2320, 128) == 1  # long-seq streaming
    # Wider head blocks (d=128 -> hd_block 256) shrink the group that
    # fits the same budget (cand=4 estimates 8.4 MB > 7 MB -> 2).
    assert _pick_batch_group(8, 512, 256) == 2
    assert _pick_batch_group(31, 448, 128) == 1   # prime, no divisor
    monkeypatch.setenv("PNP_FLASH_BB", "5")
    assert _pick_batch_group(35, 448, 128) == 5
    monkeypatch.setenv("PNP_FLASH_BB", "4")       # non-divisor -> 1
    assert _pick_batch_group(35, 448, 128) == 1


def test_proj_fold_auto_regime(monkeypatch):
    """proj-fold default: ON only in the multi-k-block streaming regime
    (768px 10.19 vs 9.87 img/s fused-wins; 336px 63.8 grouped-unfused
    vs 63.0 fused — see NOTES.md round-5 A/B)."""
    from pnp_ovss_tpu.ops.flash_attention import proj_fold_enabled

    monkeypatch.delenv("PNP_FLASH_PROJ", raising=False)
    assert not proj_fold_enabled(443)    # 336px: one 448 block
    assert proj_fold_enabled(2305)       # 768px: 5 x 464 blocks
    assert not proj_fold_enabled(None)   # no length info -> conservative
    monkeypatch.setenv("PNP_FLASH_PROJ", "1")
    assert proj_fold_enabled(443)
    monkeypatch.setenv("PNP_FLASH_PROJ", "0")
    assert not proj_fold_enabled(2305)


def test_flash_mha_flat_qkv_views_match_sliced():
    """flash_mha_flat_qkv (q/k/v as BlockSpec views into one [B, S, 3HD]
    array) == flash_mha_flat on the three channel slices — both against
    XLA. Covers the padded-true-len and batch-grouped paths."""
    from pnp_ovss_tpu.ops.flash_attention import (
        flash_mha_flat, flash_mha_flat_qkv,
    )

    rng = np.random.RandomState(12)
    b, s, h, d = 4, 443, 4, 64
    qkv = jnp.asarray(rng.randn(b, s, 3 * h * d), jnp.float32)
    hd = h * d
    got = np.asarray(
        flash_mha_flat_qkv(qkv, num_heads=h, true_len=s)
    )
    want = np.asarray(flash_mha_flat(
        qkv[..., :hd], qkv[..., hd:2 * hd], qkv[..., 2 * hd:],
        num_heads=h, true_len=s,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def split(x):
        return jnp.transpose(x.reshape(b, s, h, d), (0, 2, 1, 3))

    xla = np.asarray(jnp.transpose(attn_ops.mha_xla(
        split(qkv[..., :hd]), split(qkv[..., hd:2 * hd]),
        split(qkv[..., 2 * hd:])
    ), (0, 2, 1, 3)).reshape(b, s, hd))
    np.testing.assert_allclose(got, xla, rtol=2e-4, atol=2e-4)


def test_flash_mha_flat_qkv_long_sequence():
    """qkv-view entry point on the multi-k-block path (s=700 -> S_pad
    1024, bb=1): the 768px regime in miniature."""
    from pnp_ovss_tpu.ops.flash_attention import (
        flash_mha_flat, flash_mha_flat_qkv,
    )

    rng = np.random.RandomState(13)
    b, s, h, d = 1, 700, 2, 64
    hd = h * d
    qkv = jnp.asarray(rng.randn(b, s, 3 * hd), jnp.float32)
    got = np.asarray(flash_mha_flat_qkv(qkv, num_heads=h))
    want = np.asarray(flash_mha_flat(
        qkv[..., :hd], qkv[..., hd:2 * hd], qkv[..., 2 * hd:], num_heads=h,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_flash_mha_flat_long_sequence_matches_xla():
    """Multi-k-block online-softmax path (s=700 -> S_pad 1024, 2 q-blocks
    x 2 k-blocks) == XLA attention — the 768px regime in miniature."""
    from pnp_ovss_tpu.ops.flash_attention import (
        flash_mha_flat, flat_supported,
    )

    rng = np.random.RandomState(9)
    b, s, h, d = 1, 700, 2, 64
    q2 = jnp.asarray(rng.randn(b, s, h * d), jnp.float32)
    k2 = jnp.asarray(rng.randn(b, s, h * d), jnp.float32)
    v2 = jnp.asarray(rng.randn(b, s, h * d), jnp.float32)
    assert flat_supported(s, h, d)
    got = np.asarray(flash_mha_flat(q2, k2, v2, num_heads=h))

    def split(x):
        return jnp.transpose(x.reshape(b, s, h, d), (0, 2, 1, 3))

    want = np.asarray(jnp.transpose(
        attn_ops.mha_xla(split(q2), split(k2), split(v2)), (0, 2, 1, 3)
    ).reshape(b, s, h * d))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_vit_attention_flat_path_matches_xla_impl():
    """ViTSelfAttention with impl='pallas' (flat kernel at supported
    shapes) must equal impl='xla' on the same params."""
    import jax

    from pnp_ovss_tpu.config import ViTConfig
    from pnp_ovss_tpu.models.vit import ViTSelfAttention

    cfg = ViTConfig(
        image_size=16 * 16, patch_size=16, hidden_size=256, num_heads=4,
        num_layers=1, dtype="float32",
    )
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(2, 257, 256), jnp.float32)
    mod_x = ViTSelfAttention(cfg, impl="xla")
    params = mod_x.init(jax.random.PRNGKey(0), x)
    want = np.asarray(mod_x.apply(params, x))
    got = np.asarray(ViTSelfAttention(cfg, impl="pallas").apply(params, x))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_flash_from_qkv_dispatch(monkeypatch):
    """flash_mha_from_qkv: PNP_FLASH_QKV=0 routes through channel slices
    + flash_mha_flat, default through the qkv-view kernel — identical
    outputs (same kernel body), so the env knob is a pure perf A/B."""
    from pnp_ovss_tpu.ops.flash_attention import flash_mha_from_qkv

    rng = np.random.RandomState(11)
    b, s, h, d = 2, 130, 4, 64
    qkv = jnp.asarray(rng.randn(b, s, 3 * h * d), jnp.float32)
    monkeypatch.delenv("PNP_FLASH_QKV", raising=False)
    got_view = np.asarray(flash_mha_from_qkv(qkv, num_heads=h))
    monkeypatch.setenv("PNP_FLASH_QKV", "0")
    got_sliced = np.asarray(flash_mha_from_qkv(qkv, num_heads=h))
    np.testing.assert_allclose(got_view, got_sliced, rtol=2e-5, atol=2e-5)


def test_seq_blocks_tight_schedule():
    """seq_blocks: smallest 16-multiple padding splitting into equal
    k-blocks <= 512, keyed on the TRUE length; PNP_FLASH_TIGHT=0 restores
    the legacy 512-multiples."""
    from pnp_ovss_tpu.ops.flash_attention import seq_blocks

    assert seq_blocks(443) == (448, 1)       # ViT-L 336px
    assert seq_blocks(512) == (512, 1)
    assert seq_blocks(577) == (304, 2)       # CLIP 336px: 608, was 1024
    assert seq_blocks(2305) == (464, 5)      # ViT-L 768px: 2320, was 2560
    for s in (17, 130, 443, 577, 1000, 2305, 4097):
        block, nb = seq_blocks(s)
        assert block % 16 == 0 and block <= 512
        assert block * nb >= s
        assert block * nb - s < 16 * nb  # minimal per-block padding


def test_seq_blocks_legacy_env(monkeypatch):
    from pnp_ovss_tpu.ops import flash_attention as fa

    monkeypatch.setenv("PNP_FLASH_TIGHT", "0")
    assert fa.seq_blocks(443) == (512, 1)
    assert fa.seq_blocks(2305) == (512, 5)


def test_flash_qkv_proj_matches_unfused_chain(monkeypatch):
    """flash_mha_qkv_proj == x + attn(qkv) @ pk + pb with the proj dot
    f32-accumulated and rounded once (the TPU MXU value flow of the
    unfused XLA proj): bit-exact at a single head group (hb == h), and
    within f32 partial-sum tolerance at the shipping auto hb."""
    from pnp_ovss_tpu.ops.flash_attention import (
        flash_mha_from_qkv, flash_mha_qkv_proj,
    )

    for (b, s, h, d, dm, tl, dt) in [
        (2, 448, 16, 64, 1024, 443, jnp.float32),
        (1, 160, 4, 64, 256, 145, jnp.float32),
        (2, 448, 16, 64, 1024, 443, jnp.bfloat16),
    ]:
        rng = np.random.RandomState(1)
        qkv = jnp.asarray(rng.randn(b, s, 3 * h * d), dt)
        x = jnp.asarray(rng.randn(b, s, dm), dt)
        pk = jnp.asarray(rng.randn(h * d, dm) * 0.02, dt)
        pb = jnp.asarray(rng.randn(dm) * 0.02, dt)
        out = flash_mha_from_qkv(qkv, num_heads=h, out_dtype=dt,
                                 true_len=tl)
        want = x + (jnp.dot(out, pk,
                            preferred_element_type=jnp.float32).astype(dt)
                    + pb)
        monkeypatch.setenv("PNP_FLASH_PROJ_HB", str(h))
        flash_mha_qkv_proj.clear_cache()
        got = flash_mha_qkv_proj(qkv, x, pk, pb, num_heads=h,
                                 out_dtype=dt, true_len=tl)
        np.testing.assert_array_equal(
            np.asarray(got[:, :tl]), np.asarray(want[:, :tl]))
        monkeypatch.delenv("PNP_FLASH_PROJ_HB")
        flash_mha_qkv_proj.clear_cache()
        got = flash_mha_qkv_proj(qkv, x, pk, pb, num_heads=h,
                                 out_dtype=dt, true_len=tl)
        np.testing.assert_allclose(
            np.asarray(got[:, :tl]).astype(np.float32),
            np.asarray(want[:, :tl]).astype(np.float32),
            rtol=1e-5 if dt == jnp.float32 else 1e-2,
            atol=1e-5 if dt == jnp.float32 else 1e-2)
    flash_mha_qkv_proj.clear_cache()


def test_flash_qkv_proj_head_group_split(monkeypatch):
    """Multi-head-group accumulation (nhg > 1) matches the single-group
    result to f32 partial-sum tolerance."""
    from pnp_ovss_tpu.ops.flash_attention import flash_mha_qkv_proj

    b, s, h, d, dm, tl = 2, 448, 16, 64, 1024, 443
    rng = np.random.RandomState(2)
    qkv = jnp.asarray(rng.randn(b, s, 3 * h * d), jnp.float32)
    x = jnp.asarray(rng.randn(b, s, dm), jnp.float32)
    pk = jnp.asarray(rng.randn(h * d, dm) * 0.02, jnp.float32)
    pb = jnp.asarray(rng.randn(dm) * 0.02, jnp.float32)
    # env vars are read at trace time: clear the jit cache between flips
    # or the second call would silently reuse the first trace.
    monkeypatch.setenv("PNP_FLASH_PROJ_HB", "16")
    flash_mha_qkv_proj.clear_cache()
    one = np.asarray(flash_mha_qkv_proj(
        qkv, x, pk, pb, num_heads=h, true_len=tl)[:, :tl])
    monkeypatch.setenv("PNP_FLASH_PROJ_HB", "4")
    flash_mha_qkv_proj.clear_cache()
    four = np.asarray(flash_mha_qkv_proj(
        qkv, x, pk, pb, num_heads=h, true_len=tl)[:, :tl])
    flash_mha_qkv_proj.clear_cache()
    np.testing.assert_allclose(four, one, rtol=1e-5, atol=1e-5)
