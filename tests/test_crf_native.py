"""Native permutohedral CRF vs the exact numpy/jnp implementations."""

import numpy as np
import pytest

from pnp_ovss_tpu.config import CRFConfig

crf_host = pytest.importorskip("pnp_ovss_tpu.ops.crf_host")

pytestmark = pytest.mark.skipif(
    not crf_host.available(), reason="native lib build failed"
)


def _exact_filter(features, values):
    f = features.astype(np.float64)
    d2 = ((f[:, None, :] - f[None, :, :]) ** 2).sum(-1)
    return np.exp(-0.5 * d2) @ values.astype(np.float64)


def test_permutohedral_close_to_exact_lowdim():
    rng = np.random.RandomState(0)
    n = 300
    feats = rng.rand(n, 2).astype(np.float32) * 4
    vals = rng.rand(n, 3).astype(np.float32)
    got = crf_host.permutohedral_filter(feats, vals)
    want = _exact_filter(feats, vals)
    # The lattice is an approximation; relative filtered values should
    # correlate strongly with the exact kernel result.
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.98, corr
    # Scale should be in the right ballpark (lattice blurs slightly wider).
    ratio = got.sum() / want.sum()
    assert 0.5 < ratio < 2.0, ratio


def test_densecrf_native_cleans_salt_noise():
    rng = np.random.RandomState(3)
    h, w = 24, 24
    image = np.full((h, w, 3), 128, np.float32)
    logits = np.zeros((2, h, w), np.float32)
    logits[0] = 2.0
    for _ in range(10):
        y, x = rng.randint(0, h), rng.randint(0, w)
        logits[:, y, x] = [0.0, 2.5]
    cfg = CRFConfig(num_iters=5, pos_w=3.0, pos_xy_std=3.0,
                    bi_w=5.0, bi_xy_std=8.0, bi_rgb_std=10.0)
    out = crf_host.densecrf_labels(logits, image, cfg)
    assert (out == 0).all()


def test_densecrf_native_agrees_with_device_crf():
    """Native lattice CRF vs exact on-device mean-field on a structured map."""
    import jax
    import jax.numpy as jnp

    from pnp_ovss_tpu.ops.crf import mean_field_crf

    rng = np.random.RandomState(2)
    c, h, w = 3, 20, 24
    image = np.zeros((h, w, 3), np.float32)
    image[:, : w // 2] = [200, 30, 30]
    image[:, w // 2 :] = [30, 30, 200]
    image += rng.randn(h, w, 3) * 5
    logits = rng.randn(c, h, w).astype(np.float32) * 0.5
    logits[0, :, : w // 2] += 1.5
    logits[1, :, w // 2 :] += 1.5

    cfg = CRFConfig(num_iters=5, pos_w=3.0, pos_xy_std=2.0,
                    bi_w=4.0, bi_xy_std=6.0, bi_rgb_std=20.0)
    native = crf_host.densecrf_labels(logits, image, cfg)
    device = np.asarray(
        mean_field_crf(jnp.asarray(logits), jnp.asarray(image), cfg,
                       bilateral_impl="reference")
    )
    agreement = (native == device).mean()
    assert agreement > 0.95, agreement


def test_permutohedral_5d_bilateral_features():
    """Lattice filtering in the CRF's actual 5D feature space."""
    rng = np.random.RandomState(7)
    n = 400
    feats = np.concatenate(
        [rng.rand(n, 2) * 3, rng.rand(n, 3) * 10], axis=1
    ).astype(np.float32)
    vals = rng.rand(n, 4).astype(np.float32)
    got = crf_host.permutohedral_filter(feats, vals)
    want = _exact_filter(feats, vals)
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    # The lattice is a coarser approximation in 5D (~0.92 corr here —
    # the same accuracy class as pydensecrf's lattice; the on-device
    # Pallas kernel is exact).
    assert corr > 0.9, corr
