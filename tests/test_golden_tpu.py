"""On-device realistic-scale regression golden (VERDICT r2 #2).

Re-runs the full-config pipeline (336px, drop4, blur+CRF, bucket 192,
strided s4, fixed-seed random weights — the round-3 shipping defaults;
see scripts/capture_golden_tpu.py) on the TPU and compares against the
committed fixture tests/golden_tpu.npz (captured by
scripts/capture_golden_tpu.py).

This is the tripwire for TPU-only numerics bugs — bf16 MXU truncation,
Mosaic lowering changes — that CPU tests structurally cannot catch (the
round-2 bilateral-exponent disaster ran at 1e9 relative error on TPU while
every CPU test passed). SKIPS on CPU; run on the bench host each round:

  python -m pytest tests/test_golden_tpu.py -q
"""

import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "golden_tpu.npz")
FIXTURE_768 = os.path.join(os.path.dirname(__file__), "golden_tpu_768.npz")


@pytest.fixture(scope="module")
def tpu_backend():
    import jax

    # The suite conftest pins CPU unless PNP_GOLDEN_TPU=1 (run this file
    # ALONE with it: PNP_GOLDEN_TPU=1 pytest tests/test_golden_tpu.py).
    if not os.environ.get("PNP_GOLDEN_TPU") or \
            jax.default_backend() == "cpu":
        pytest.skip("golden_tpu requires PNP_GOLDEN_TPU=1 + the TPU chip")
    return jax.default_backend()


def _check_against(fixture, got):
    want = np.load(fixture)
    # Attribution-side checksums: grid-map sums are pure model+threshold
    # output. rtol covers matmul reassociation across compiler versions;
    # a kernel-numerics regression moves these by orders of magnitude.
    np.testing.assert_allclose(
        got["grid_r0_sum"], want["grid_r0_sum"], rtol=1e-3)
    np.testing.assert_allclose(
        got["grid_agg_sum"], want["grid_agg_sum"], rtol=1e-3)
    np.testing.assert_allclose(
        got["maps_agg_sum"], want["maps_agg_sum"], rtol=1e-3)

    # Post-side labels: exact on the same stack; a tiny allowance covers
    # argmax tie flips under compiler upgrades. The bf16-exponent class
    # of bug flips the majority of labels, not 0.1%.
    for key in ("labels_r0", "labels_agg"):
        mism = (got[key] != want[key]).mean()
        assert mism <= 0.001, (
            f"{key}: {mism:.2%} label mismatch vs committed TPU golden "
            f"(captured on {want['backend']})"
        )


def _run_pipeline(**kw):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from scripts.capture_golden_tpu import run_pipeline

    return run_pipeline(**kw)


def test_full_config_golden_on_device(tpu_backend):
    if not os.path.exists(FIXTURE):
        pytest.fail(
            "tests/golden_tpu.npz missing — run "
            "scripts/capture_golden_tpu.py on the TPU host"
        )
    _check_against(FIXTURE, _run_pipeline())


def test_full_config_golden_768_on_device(tpu_backend):
    """The 768px long-sequence leg (VERDICT r4 #3): 2305-token encode
    through the xlen-unified flash schedule — a separate Mosaic kernel
    configuration from the 336px path, with its own committed fixture so
    a long-seq-only regression cannot reach a bench capture undetected."""
    if not os.path.exists(FIXTURE_768):
        pytest.fail(
            "tests/golden_tpu_768.npz missing — run "
            "scripts/capture_golden_tpu.py 768 on the TPU host"
        )
    _check_against(FIXTURE_768, _run_pipeline(img_size=768, b=2))
