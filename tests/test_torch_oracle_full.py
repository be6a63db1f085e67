"""Full-size (ViT-L/16 + BERT-base) torch-oracle parity.

Slow (~2-4 min on CPU): random full-scale weights in the LAVIS layout ->
converter -> Flax forward vs the from-scratch torch oracle. Catches
stacking-order / head-layout bugs invisible at tiny shapes (e.g. nn.scan
parameter stacking, 16-head qkv packing, encoder_width=1024 cross K/V).

Run explicitly: RUN_SLOW_TESTS=1 python -m pytest tests/test_torch_oracle_full.py
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_SLOW_TESTS"),
    reason="slow full-scale oracle; set RUN_SLOW_TESTS=1",
)


def test_full_scale_itm_logits_match_torch():
    import jax
    import jax.numpy as jnp

    from pnp_ovss_tpu.config import BertConfig, ModelConfig, ViTConfig
    from pnp_ovss_tpu.models.blip_itm import BlipITM
    from pnp_ovss_tpu.models.convert import convert_state_dict
    from tests.test_convert import _tiny_torch_state_dict
    from tests.test_torch_oracle import _torch_blip_itm

    torch = pytest.importorskip("torch")

    # Full architecture, small text bucket to keep the oracle quick.
    cfg = ModelConfig(
        vit=ViTConfig(image_size=336, dtype="float32"),
        bert=BertConfig(dtype="float32"),
        max_text_len=32,
    )
    rng = np.random.RandomState(0)
    sd = _tiny_torch_state_dict(cfg, rng)

    capture_layer = 7
    params = convert_state_dict(sd, cfg, capture_layers=(capture_layer,))
    model = BlipITM(cfg, capture_layers=(capture_layer,), attn_impl="xla")

    B = 1
    images = rng.randn(B, 336, 336, 3).astype(np.float32) * 0.5
    ids = np.zeros((B, cfg.max_text_len), np.int64)
    mask = np.zeros((B, cfg.max_text_len), np.int64)
    ids[:, :10] = rng.randint(5, 30000, (B, 10))
    mask[:, :10] = 1

    logits_t, _ = _torch_blip_itm(
        sd, cfg, torch.tensor(images.transpose(0, 3, 1, 2)),
        torch.tensor(ids), torch.tensor(mask), capture_layer,
    )

    logits_j, _ = jax.jit(model.apply)(
        params, jnp.asarray(images), jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32),
    )
    np.testing.assert_allclose(
        np.asarray(logits_j), logits_t.detach().numpy(), rtol=1e-3, atol=2e-3
    )
