"""Sequence-parallel ViT encode tests on the virtual 8-device CPU mesh.

The reference has no long-context strategy whatsoever (SURVEY §5: "no
ring attention, no context parallel, no Ulysses, no blockwise attention
anywhere" — at 768px it materialises [B, 16, 2305, 2305] on one GPU,
vit.py:104-106). Sequence parallelism is a TPU-native extension for the
regime data parallelism cannot reach (per-chip batch already 1): the
token axis shards over the mesh's ``model`` axis, attention all-gathers
K/V per layer, everything else stays row-local.

These tests pin the property that makes it trustworthy: the sharded
encode equals the unsharded encode EXACTLY — the per-row math (k-block
schedule, contractions, LN) is untouched; only the row ownership moves.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnp_ovss_tpu.config import ModelConfig, ViTConfig
from pnp_ovss_tpu.models.vit import VisionTransformer
from pnp_ovss_tpu.parallel import mesh as mesh_mod
from pnp_ovss_tpu.parallel.sequence import encode_images_sp


def _mesh_2x4():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh (tests/conftest.py)")
    return mesh_mod.make_mesh_2d(4)  # data=2 x model=4


def test_sp_encode_matches_unsharded_xla():
    """Tiny ViT, xla attention: dp=2 x sp=4 encode == single-device
    encode. seq_len=10 is not divisible by sp=4 — exercises the padded
    chunking + key-mask path (masked keys contribute exact-zero terms).
    Tolerance note: the masked-attention math is exact, but the CPU
    backend's f32 matmuls block rows differently at 3-row chunks than at
    the 10-row full sequence (~1e-6 drift); the pallas/interpret test
    below is the bitwise one."""
    mesh = _mesh_2x4()
    cfg = ModelConfig.tiny().vit
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.rand(4, cfg.image_size, cfg.image_size, 3), jnp.float32)

    model = VisionTransformer(cfg, impl="xla")
    params = model.init(jax.random.PRNGKey(1), images[:1])
    want = model.apply(params, images)

    got = encode_images_sp(cfg, params, images, mesh, impl="xla")
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_sp_encode_matches_unsharded_fused_pallas():
    """Kernel-path SP (fused LN+qkv blocks, cross-length flash attention
    with gathered K/V): exact equality with the unsharded fused encode.
    hidden 128 / heads 2 / 145 tokens -> S_pad 512, 128-token chunks."""
    mesh = _mesh_2x4()
    cfg = ViTConfig(
        image_size=192, patch_size=16, hidden_size=128, num_layers=2,
        num_heads=2, dtype="bfloat16",
    )
    rng = np.random.RandomState(2)
    images = jnp.asarray(
        rng.rand(2, cfg.image_size, cfg.image_size, 3), jnp.float32)

    model = VisionTransformer(cfg, impl="pallas")
    params = model.init(jax.random.PRNGKey(3), images[:1])
    want = model.apply(params, images)

    got = encode_images_sp(cfg, params, images, mesh, impl="pallas")
    assert got.shape == want.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_xlen_flash_matches_equal_length_kernel():
    """flash_mha_flat_xlen on a query chunk == the corresponding row slice
    of flash_mha_flat on the full sequence (same k-block schedule)."""
    from pnp_ovss_tpu.ops.flash_attention import (
        flash_mha_flat, flash_mha_flat_xlen,
    )

    b, s, h, d = 2, 512, 2, 64
    rng = np.random.RandomState(4)
    q = jnp.asarray(rng.randn(b, s, h * d), jnp.float32)
    k = jnp.asarray(rng.randn(b, s, h * d), jnp.float32)
    v = jnp.asarray(rng.randn(b, s, h * d), jnp.float32)
    true_len = 443

    full = flash_mha_flat(q, k, v, num_heads=h, true_len=true_len)
    for lo, hi in ((0, 128), (128, 256), (384, 512)):
        part = flash_mha_flat_xlen(
            q[:, lo:hi], k, v, num_heads=h, true_kv_len=true_len)
        # Rows >= true_len are padding garbage by contract (every consumer
        # slices [:, :seq_len]); the canonical tight schedule computes a
        # different carried pad per entry point, so only real rows are
        # comparable.
        real_hi = min(hi, true_len)
        np.testing.assert_array_equal(
            np.asarray(part)[:, :real_hi - lo],
            np.asarray(full[:, lo:real_hi]))
