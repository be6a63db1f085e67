"""Pipeline-parallel ViT encode tests on the virtual 8-device CPU mesh.

The reference's only distribution strategy is DDP with the full model on
every rank (driver :45-54, :1438-1439; SURVEY §2.4). Pipeline
parallelism is a TPU-native extension: the nn.scan-stacked block
parameters shard their leading [num_layers] axis over the mesh's
``model`` axis and microbatches flow stage-to-stage via ppermute
(parallel/pipeline.py). These tests pin the property that makes it
trustworthy: the pipelined encode equals the unsharded encode — the
per-layer block math is untouched, only layer ownership and batch
chunking move.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnp_ovss_tpu.config import ModelConfig, ViTConfig
from pnp_ovss_tpu.models.vit import VisionTransformer
from pnp_ovss_tpu.parallel import mesh as mesh_mod
from pnp_ovss_tpu.parallel.pipeline import encode_images_pp


def _mesh(pp: int):
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh (tests/conftest.py)")
    return mesh_mod.make_mesh_2d(pp)  # data = 8//pp x model = pp


def test_pp_encode_matches_unsharded_xla():
    """Tiny ViT, xla attention, dp=2 x pp=4 (one layer per stage):
    pipelined encode == single-device encode. Tolerance note: the block
    math is identical, but the CPU backend's f32 matmuls block rows
    differently at microbatch size 1 than at the full batch (~1e-6
    drift); the fused-pallas test below is the bitwise one."""
    mesh = _mesh(4)
    cfg = dataclasses.replace(ModelConfig.tiny().vit, num_layers=4)
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.rand(8, cfg.image_size, cfg.image_size, 3), jnp.float32)

    model = VisionTransformer(cfg, impl="xla")
    params = model.init(jax.random.PRNGKey(1), images[:1])
    want = model.apply(params, images)

    got = encode_images_pp(cfg, params, images, mesh, impl="xla")
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_pp_encode_matches_unsharded_fused_pallas():
    """Kernel-path pp (fused LN+qkv / LN+MLP blocks, flat flash
    attention): exact equality with the unsharded fused encode.
    dp=4 x pp=2, hidden 128 / heads 2 / 145 tokens -> S_pad 512."""
    mesh = _mesh(2)
    cfg = ViTConfig(
        image_size=192, patch_size=16, hidden_size=128, num_layers=2,
        num_heads=2, dtype="bfloat16",
    )
    rng = np.random.RandomState(2)
    images = jnp.asarray(
        rng.rand(8, cfg.image_size, cfg.image_size, 3), jnp.float32)

    model = VisionTransformer(cfg, impl="pallas")
    params = model.init(jax.random.PRNGKey(3), images[:1])
    want = model.apply(params, images)

    got = encode_images_pp(cfg, params, images, mesh, impl="pallas")
    assert got.shape == want.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pp_more_microbatches_than_stages():
    """M > pp (the bubble-amortising regime): schedule still exact."""
    mesh = _mesh(2)
    cfg = ModelConfig.tiny().vit  # num_layers=2
    rng = np.random.RandomState(4)
    images = jnp.asarray(
        rng.rand(16, cfg.image_size, cfg.image_size, 3), jnp.float32)

    model = VisionTransformer(cfg, impl="xla")
    params = model.init(jax.random.PRNGKey(5), images[:1])
    want = model.apply(params, images)

    got = encode_images_pp(
        cfg, params, images, mesh, impl="xla", num_microbatches=4)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_pp_rejects_indivisible_shapes():
    mesh = _mesh(4)
    cfg = ModelConfig.tiny().vit  # num_layers=2, not divisible by pp=4
    rng = np.random.RandomState(6)
    images = jnp.asarray(
        rng.rand(8, cfg.image_size, cfg.image_size, 3), jnp.float32)
    model = VisionTransformer(cfg, impl="xla")
    params = model.init(jax.random.PRNGKey(7), images[:1])

    with pytest.raises(ValueError, match="num_layers"):
        encode_images_pp(cfg, params, images, mesh, impl="xla")

    cfg4 = dataclasses.replace(cfg, num_layers=4)
    params4 = VisionTransformer(cfg4, impl="xla").init(
        jax.random.PRNGKey(8), images[:1])
    with pytest.raises(ValueError, match="num_microbatches"):
        encode_images_pp(
            cfg4, params4, images, mesh, impl="xla", num_microbatches=3)
