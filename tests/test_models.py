"""Model-stack unit tests (tiny config, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnp_ovss_tpu.config import ModelConfig
from pnp_ovss_tpu.models.blip_itm import BlipITM, init_params
from pnp_ovss_tpu.models.vit import VisionTransformer, interpolate_pos_embed


@pytest.fixture(scope="module")
def tiny():
    cfg = ModelConfig.tiny()
    model = BlipITM(cfg, capture_layers=(1,), attn_impl="xla")
    params = init_params(jax.random.PRNGKey(0), cfg, capture_layers=(1,))
    japply = jax.jit(model.apply)
    return cfg, model, params, japply


def _inputs(cfg, b=2, seed=0):
    rng = np.random.RandomState(seed)
    images = jnp.asarray(
        rng.randn(b, cfg.vit.image_size, cfg.vit.image_size, 3), jnp.float32
    )
    t = cfg.max_text_len
    ids = jnp.asarray(rng.randint(5, cfg.bert.vocab_size - 2, (b, t)), jnp.int32)
    mask = jnp.asarray((np.arange(t)[None, :] < 9).astype(np.int32).repeat(b, 0))
    ids = jnp.where(mask == 0, 0, ids)
    return images, ids, mask


def test_vit_shapes(tiny):
    cfg, _, _, _ = tiny
    vit = VisionTransformer(cfg.vit, impl="xla")
    p = vit.init(jax.random.PRNGKey(1), jnp.zeros((2, 48, 48, 3)))
    out = jax.jit(vit.apply)(p, jnp.ones((2, 48, 48, 3)))
    assert out.shape == (2, cfg.vit.seq_len, cfg.vit.hidden_size)
    assert np.isfinite(np.asarray(out)).all()


def test_itm_forward_shapes(tiny):
    cfg, model, params, japply = tiny
    images, ids, mask = _inputs(cfg)
    logits, probs = japply(params, images, ids, mask)
    assert logits.shape == (2, 2)
    assert probs.shape == (
        1, 2, cfg.bert.num_heads, cfg.max_text_len, cfg.vit.seq_len
    )
    # Captured maps are probabilities over image tokens.
    np.testing.assert_allclose(
        np.asarray(probs).sum(-1), 1.0, rtol=1e-4, atol=1e-4
    )


def test_padding_invariance(tiny):
    """ITM logits must not depend on pad length (mask removes pads)."""
    cfg, model, params, japply = tiny
    images, ids, mask = _inputs(cfg)
    logits_a, _ = japply(params, images, ids, mask)

    # Truncate pads to a shorter static length.
    t_short = 10
    logits_b, _ = japply(
        params, images, ids[:, :t_short], mask[:, :t_short]
    )
    np.testing.assert_allclose(
        np.asarray(logits_a), np.asarray(logits_b), rtol=2e-4, atol=2e-4
    )


def test_tap_is_transparent(tiny):
    """A zero tap must not change the forward results."""
    cfg, model, params, japply = tiny
    images, ids, mask = _inputs(cfg)
    logits_a, probs_a = japply(params, images, ids, mask)
    tap = jnp.zeros_like(probs_a)
    logits_b, probs_b = japply(params, images, ids, mask, cross_tap=tap)
    np.testing.assert_allclose(np.asarray(logits_a), np.asarray(logits_b))
    np.testing.assert_allclose(np.asarray(probs_a), np.asarray(probs_b))


def test_itc_shape(tiny):
    cfg, model, params, _ = tiny
    images, ids, mask = _inputs(cfg)
    sim = jax.jit(lambda p, i, t, m: model.apply(p, i, t, m, method=BlipITM.itc))(
        params, images, ids, mask
    )
    assert sim.shape == (2, 2)
    assert np.isfinite(np.asarray(sim)).all()


def test_interpolate_pos_embed():
    pe = jnp.asarray(np.random.RandomState(0).randn(1, 1 + 9, 8), jnp.float32)
    out = interpolate_pos_embed(pe, 25)
    assert out.shape == (1, 26, 8)
    np.testing.assert_allclose(out[:, 0], pe[:, 0])  # CLS preserved
    assert interpolate_pos_embed(pe, 9) is pe


def test_itm_rank(tiny):
    cfg, model, params, _ = tiny
    images, ids, mask = _inputs(cfg)
    embeds = jax.jit(
        lambda p, im: model.apply(p, im, method=BlipITM.encode_image)
    )(params, images)
    probs = jax.jit(
        lambda p, e, i: model.apply(p, e, i, method=BlipITM.itm_rank)
    )(params, embeds, ids)
    assert probs.shape == (2,)
    p = np.asarray(probs)
    assert ((0 <= p) & (p <= 1)).all()
