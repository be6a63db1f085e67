"""Measure the torch reference envelope on CPU (BASELINE.md item 7).

The environment has no GPU, so the reference (CUDA/torch,
`PnP_OVSS_0514_updated_segmentation.py`) cannot be run on its published
48 GB-GPU setup. This script measures the reference's *computational
envelope* on the CPU we do have, with the exact per-batch cost structure
of the reference hot loop (SURVEY §3.1):

  per batch:   drop_iter=4 x (BLIP-ITM forward + full backward)
               [reference :587-722; backward at
                blip_image_text_matching.py:399-404]
  per image:   2 x (scipy-style Gaussian blur + 10-iter DenseCRF at GT
               resolution) [reference :1002-1074,1149-1153 — run for the
               round-0 and aggregated variants, matching bench.py]

Model: the from-scratch torch oracle (tests/test_torch_oracle.py) at the
full BLIP-ITM-Large config — ViT-L/16 336px + BERT-base fusion with
per-layer cross-attention, text padded to 500 (reference tokenizer
`max_length=500 padding="max_length"`, driver :271-272). Random weights
(throughput is weight-independent). The CRF stand-in is this repo's
native C++ permutohedral lattice, the same algorithm as the reference's
pydensecrf dependency.

Output: one JSON line with the measured CPU img/s. This is a *CPU-scaled*
measurement: single-core torch, no CUDA. It bounds the reference from
below; the GPU number remains an estimate (bench.py documents it and
emits `vs_baseline_estimated: true`).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import torch
    from scipy.ndimage import gaussian_filter

    from pnp_ovss_tpu.config import CRFConfig, ModelConfig
    from pnp_ovss_tpu.ops.crf_host import densecrf_labels
    from tests.test_convert import _tiny_torch_state_dict
    from tests.test_torch_oracle import _torch_blip_itm

    cfg = ModelConfig()  # full BLIP-ITM-Large
    rng = np.random.RandomState(0)
    sd = _tiny_torch_state_dict(cfg, rng)  # generator is config-generic

    B = int(os.environ.get("MEASURE_BATCH", "1"))
    iters = int(os.environ.get("MEASURE_ITERS", "2"))
    images = torch.tensor(
        rng.randn(B, 3, cfg.vit.image_size, cfg.vit.image_size).astype(
            np.float32
        )
    )
    ids = np.zeros((B, cfg.max_text_len), np.int64)
    mask = np.zeros((B, cfg.max_text_len), np.int64)
    ids[:, :16] = rng.randint(1000, 20000, (B, 16))
    mask[:, :16] = 1
    ids_t, mask_t = torch.tensor(ids), torch.tensor(mask)

    # One fwd+bwd == one drop round of the reference hot loop.
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        logits, _ = _torch_blip_itm(
            sd, cfg, images, ids_t, mask_t, capture_layer=7
        )
        logits[:, 1].sum().backward()
        times.append(time.perf_counter() - t0)
    per_img_round = min(times) / B

    # Per-image postprocess at a typical VOC GT resolution, 3 classes + bg.
    H, W, C = 375, 500, 4
    maps = rng.rand(C, H, W).astype(np.float32)
    rgb = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
    sigma = 0.05 * max(H, W)
    t0 = time.perf_counter()
    blurred = np.stack([gaussian_filter(m, sigma) for m in maps])
    t_blur = time.perf_counter() - t0
    t0 = time.perf_counter()
    densecrf_labels(blurred, rgb.astype(np.float32), CRFConfig(num_iters=10))
    t_crf = time.perf_counter() - t0

    drop_iter = 4
    per_img = drop_iter * per_img_round + 2 * (t_blur + t_crf)
    out = {
        "metric": "reference_envelope_imgs_per_sec_cpu_1core",
        "value": round(1.0 / per_img, 4),
        "unit": "img/s",
        "per_img_fwdbwd_s": round(per_img_round, 2),
        "per_img_blur_s": round(t_blur, 3),
        "per_img_crf_s": round(t_crf, 3),
        "batch": B,
        "note": "torch CPU single core; GPU envelope not measurable here",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
