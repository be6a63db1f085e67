"""Salience-drop loop semantics: scan reference vs split-step production.

``salience_drop_loop`` (one lax.scan graph) is the semantic reference; the
production path uses ``make_split_round_step`` + ``run_drop_rounds`` (two
small programs per round, fast remote compiles). They must agree exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnp_ovss_tpu.config import DropConfig, ModelConfig
from pnp_ovss_tpu.models.blip_itm import BlipITM, init_params
from pnp_ovss_tpu.attribution.gradcam import (
    gradcam_from_embeds, gradcam_from_tap, make_gradcam_fn,
)
from pnp_ovss_tpu.pipeline.drop import (
    make_split_round_step, run_drop_rounds, salience_drop_loop,
)


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig.tiny()
    model = BlipITM(cfg, capture_layers=(0,), attn_impl="xla")
    params = init_params(jax.random.PRNGKey(0), cfg, capture_layers=(0,))
    return cfg, model, params


def test_scan_and_split_loops_agree(setup):
    cfg, model, params = setup
    rng = np.random.RandomState(3)
    b = 2
    images = jnp.asarray(rng.rand(b, 48, 48, 3), jnp.float32)
    ids = np.zeros((b, cfg.max_text_len), np.int32)
    mask = np.zeros((b, cfg.max_text_len), np.int32)
    ids[:, :8] = rng.randint(5, 60, (b, 8))
    mask[:, :8] = 1
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)
    dcfg = DropConfig(num_rounds=3, patches_per_round=2)

    # Reference: single-graph scan loop.
    gfn = make_gradcam_fn(model, params, layer=1, head=1)
    gc0_a, agg_a = jax.jit(
        lambda im, i, m: salience_drop_loop(
            gfn, im, i, m, cfg=dcfg, grid=3, patch_size=16,
        )
    )(images, ids, mask)

    # Production: split-program stepwise loop.
    def embed_fn(p, im):
        return model.apply(p, im, method=BlipITM.encode_image)

    def bert_fn(p, embeds, i, m):
        def apply_embeds_fn(pp, e, ii, mm, cross_tap):
            return model.apply(pp, e, ii, mm, cross_tap=cross_tap,
                               method=BlipITM.itm_from_embeds)

        gc, logits = gradcam_from_embeds(
            apply_embeds_fn, p, embeds, i, m,
            num_capture_layers=1, num_heads=cfg.bert.num_heads, grid=3,
        )
        return gc[0, :, 1], logits

    step = make_split_round_step(embed_fn, bert_fn, cfg=dcfg, grid=3,
                                 patch_size=16)
    import functools

    gc0_b, agg_b = run_drop_rounds(
        functools.partial(step, params), images, ids, mask,
        cfg=dcfg, num_patches=9,
    )

    np.testing.assert_allclose(
        np.asarray(gc0_a), np.asarray(gc0_b), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(agg_a), np.asarray(agg_b), rtol=1e-4, atol=1e-6
    )


def test_drop_masks_progress(setup):
    """Each round drops patches_per_round NEW patches; round-0 double count."""
    cfg, model, params = setup
    rng = np.random.RandomState(5)
    images = jnp.asarray(rng.rand(1, 48, 48, 3), jnp.float32)
    ids = np.zeros((1, cfg.max_text_len), np.int32)
    mask = np.zeros((1, cfg.max_text_len), np.int32)
    ids[0, :8] = rng.randint(5, 60, 8)
    mask[0, :8] = 1
    gfn = make_gradcam_fn(model, params, layer=1, head=1)

    dcfg1 = DropConfig(num_rounds=1, patches_per_round=3)
    gc0, agg = salience_drop_loop(
        gfn, images, jnp.asarray(ids), jnp.asarray(mask),
        cfg=dcfg1, grid=3, patch_size=16,
    )
    np.testing.assert_allclose(np.asarray(agg), 2 * np.asarray(gc0),
                               rtol=1e-6)

    nodouble = DropConfig(num_rounds=1, patches_per_round=3,
                          double_count_round0=False)
    gc0_n, agg_n = salience_drop_loop(
        gfn, images, jnp.asarray(ids), jnp.asarray(mask),
        cfg=nodouble, grid=3, patch_size=16,
    )
    np.testing.assert_allclose(np.asarray(agg_n), np.asarray(gc0_n),
                               rtol=1e-6)
