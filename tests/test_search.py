"""Search subsystem tests: optimizer, token contrast, reward machinery."""

import json

import jax.numpy as jnp
import numpy as np

from pnp_ovss_tpu.search.optimizer import (
    RandomAnnealingOptimizer, SearchSpace,
)
from pnp_ovss_tpu.search.reward import (
    RewardEvaluator, build_pos_masks, pos_win_reward, token_contrast,
)


def test_optimizer_finds_peak():
    space = SearchSpace({
        "layer": list(range(1, 13)),
        "head": list(range(12)),
        "min_att": [0.05 * i for i in range(1, 10)],
    })

    def score(p):
        return -((p["layer"] - 8) ** 2) - (p["head"] - 9) ** 2 - abs(
            p["min_att"] - 0.25
        )

    opt = RandomAnnealingOptimizer(space, seed=7)
    best, best_score = opt.search(score, n_iter=200)
    assert best["layer"] in (7, 8, 9)
    assert abs(best["head"] - 9) <= 1
    assert len(opt.history) == 200


def test_optimizer_deterministic():
    space = SearchSpace({"x": list(range(100))})
    f = lambda p: -abs(p["x"] - 42)
    a = RandomAnnealingOptimizer(space, seed=3).search(f, n_iter=34)
    b = RandomAnnealingOptimizer(space, seed=3).search(f, n_iter=34)
    assert a == b


def test_token_contrast_extremes():
    # Identical maps -> cos sim 1 everywhere -> TCSum == 1, std 0.
    m = np.ones((1, 3, 4, 4), np.float32)
    tc, std = token_contrast(jnp.asarray(m))
    np.testing.assert_allclose(tc, 1.0, rtol=1e-5)
    np.testing.assert_allclose(std, 0.0, atol=1e-5)
    # Orthogonal maps -> mean = K/K^2 (only diagonal ones).
    m2 = np.zeros((1, 2, 1, 2), np.float32)
    m2[0, 0, 0, 0] = 1
    m2[0, 1, 0, 1] = 1
    tc2, _ = token_contrast(jnp.asarray(m2))
    np.testing.assert_allclose(tc2, 0.5, rtol=1e-5)


def test_pos_win_reward():
    probs = np.asarray([
        [0.9, 0.1],  # pos class 0: 0.9
        [0.3, 0.6],  # pos class 1: 0.6
        [0.5, 0.2],  # neg class 0: 0.5
        [0.1, 0.7],  # neg class 1: 0.7
    ])
    avg, wins = pos_win_reward(probs, 2)
    assert wins == 1  # 0.9 > 0.5 but 0.6 < 0.7
    np.testing.assert_allclose(
        avg, np.mean([0.5 / 0.9, 0.7 / 0.6]), rtol=1e-6
    )


def test_build_pos_masks_shapes():
    maps = np.random.RandomState(0).rand(3, 7, 7).astype(np.float32)
    image = np.random.RandomState(1).rand(28, 28, 3).astype(np.float32)
    masked, token = build_pos_masks(maps, image, 0.5)
    assert masked.shape == (3, 28, 28, 3)
    assert token.shape == (3, 24, 24)
    # Below-threshold maps produce black images.
    masked0, _ = build_pos_masks(
        np.zeros((1, 7, 7), np.float32), image, 0.5
    )
    assert np.abs(masked0).sum() == 0


def test_reward_evaluator_memoizes(tmp_path):
    rng = np.random.RandomState(0)
    maps = rng.rand(2, 7, 7).astype(np.float32)
    image = rng.rand(28, 28, 3).astype(np.float32)
    calls = {"n": 0}

    def provider(layer, head):
        yield "img0", (maps, ["dog", "cat"], image)

    def scorer(images, texts):
        calls["n"] += 1
        n = len(images)
        out = np.full((n, len(texts)), 0.1)
        out[: n // 2] = 0.8  # positives always win
        return out

    ev = RewardEvaluator(provider, scorer, cache_dir=str(tmp_path))
    r1 = ev({"layer": 8, "head": 9, "min_att": 0.25})
    assert r1 == 2.0
    assert calls["n"] == 1
    r2 = ev({"layer": 8, "head": 9, "min_att": 0.25})
    assert r2 == 2.0
    assert calls["n"] == 1  # served from cache
    cache_file = tmp_path / "layer8_head9" / "reward_metric_dict_attthresh25.json"
    assert cache_file.exists()
    detail = json.loads(cache_file.read_text())
    assert detail["total_pos_win_sum_layer8_head9"] == 2.0
