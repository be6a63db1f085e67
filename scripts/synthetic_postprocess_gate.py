"""Synthetic end-to-end postprocess mIoU gate (runnable TODAY, no assets).

The real-checkpoint gate (scripts/accuracy_gate.py) needs weights and
datasets this environment does not have. But every accuracy-relevant
approximation the device path makes relative to the reference —

  1. postprocess at a fixed bucket resolution + nearest-label upsample to
     GT resolution (reference runs blur+CRF at exact GT resolution,
     driver :1030-1074,1149-1153),
  2. approximate bilateral support (strided / Nystrom anchors) instead of
     the exact dense kernel,
  3. bfloat16 blur / kernel matmuls,
  4. the background channel synthesised at bucket instead of GT resolution,

— lives entirely in the postprocess, downstream of the model. This gate
therefore measures exactly those approximations end to end, with no model:
it builds photo-like synthetic scenes (piecewise-region GT, textured RGB,
noisy grid-resolution saliency maps shaped like thresholded GradCAMs),
pushes the SAME maps through

  anchor : the host-parity path (bilinear to GT res, f32 blur, native
           permutohedral DenseCRF at exact GT res) — the reference's
           semantics, and
  grid   : the production device path (SegmentationRunner._post at the
           bucket + nearest upsample) across the approximation grid,

and reports mIoU deltas against the anchor and the 0.3-point budget
(BASELINE.json north star). Run on the TPU for production numbers
(pallas bilateral + bf16) or on CPU (reference bilateral):

  python scripts/synthetic_postprocess_gate.py --scenes 24 \
      --out /tmp/synth_gate.json
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEVICE_GRID = [
    # (tag, bilateral_mode, subsample, bucket)
    ("strided_s4_b224", "strided", 4, 224),  # shipping default
    ("strided_s2_b224", "strided", 2, 224),
    ("strided_s3_b224", "strided", 3, 224),
    ("strided_s6_b224", "strided", 6, 224),
    ("strided_s4_b192", "strided", 4, 192),
    # Bucket-resolution sweep: the residual device-vs-anchor gap is
    # boundary information the CRF recovers from full-res RGB.
    ("strided_s4_b288", "strided", 4, 288),
    ("strided_s4_b336", "strided", 4, 336),
    ("nystrom_s8_b224", "nystrom", 8, 224),  # known-bad at 224: for record
]

SIZES = [(375, 500), (500, 375), (333, 500), (480, 360)]


def make_scene(rng: np.random.RandomState, h: int, w: int, k: int, grid: int):
    """One photo-like scene: GT labels, textured RGB, grid saliency maps.

    GT: argmax of k+1 smooth random fields (channel 0 = background).
    RGB: per-region base colour + texture noise + illumination gradient.
    Saliency: per-class GT indicator average-pooled to the model grid,
    degraded the way real thresholded GradCAMs are — multiplicative
    amplitude jitter, additive noise, and leakage onto wrong classes.
    """
    lowres = 8
    fields = rng.randn(k + 1, lowres, lowres).astype(np.float32)
    fields = _upsample_bilinear(fields, h, w)
    fields[0] -= 0.35  # background loses ties unless clearly dominant
    gt = np.argmax(fields, axis=0).astype(np.int32)

    colors = rng.randint(30, 226, (k + 1, 3)).astype(np.float32)
    rgb = colors[gt]
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    rgb += (xx[..., None] / w - 0.5) * rng.uniform(-40, 40)
    rgb += (yy[..., None] / h - 0.5) * rng.uniform(-40, 40)
    rgb += rng.randn(h, w, 3).astype(np.float32) * 12.0
    rgb = np.clip(rgb, 0, 255)

    maps = np.zeros((k, grid, grid), np.float32)
    ys = np.linspace(0, h, grid + 1).astype(int)
    xs = np.linspace(0, w, grid + 1).astype(int)
    for c in range(1, k + 1):
        ind = (gt == c).astype(np.float32)
        pooled = np.add.reduceat(
            np.add.reduceat(ind, ys[:-1], axis=0), xs[:-1], axis=1
        )
        area = np.maximum(
            np.outer(np.diff(ys), np.diff(xs)).astype(np.float32), 1.0
        )
        m = pooled / area
        m *= rng.uniform(0.6, 1.0)                      # amplitude jitter
        m += np.abs(rng.randn(grid, grid)) * 0.08       # saliency noise
        m += rng.uniform(0.0, 0.06) * (np.max(maps, axis=0)
                                       if c > 1 else 0.0)  # class leakage
        maps[c - 1] = m
    return gt, rgb, maps


def _upsample_bilinear(x: np.ndarray, h: int, w: int) -> np.ndarray:
    import jax.numpy as jnp
    from pnp_ovss_tpu.ops.resize import resize_bilinear_align_corners

    return np.array(resize_bilinear_align_corners(jnp.asarray(x), h, w))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scenes", type=int, default=24)
    p.add_argument("--max_k", type=int, default=6)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--budget", type=float, default=0.3)
    p.add_argument("--out", default=None)
    p.add_argument("--cpu", action="store_true",
                   help="pin to CPU (reference bilateral impl)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from pnp_ovss_tpu.config import PipelineConfig
    from pnp_ovss_tpu.evalx.metrics import fast_hist, scores_from_hist
    from pnp_ovss_tpu.pipeline import masks as masks_mod
    from pnp_ovss_tpu.pipeline.runner import SegmentationRunner

    on_tpu = jax.default_backend() not in ("cpu",)
    bilateral_impl = "pallas" if on_tpu else "reference"
    base_cfg = PipelineConfig()  # reference constants (threshold, CRF, ...)
    grid = base_cfg.model.vit.grid
    kmax = base_cfg.max_classes
    n_class = args.max_k + 1

    rng = np.random.RandomState(args.seed)
    scenes = []
    for i in range(args.scenes):
        h, w = SIZES[i % len(SIZES)]
        k = int(rng.randint(2, args.max_k + 1))
        scenes.append((make_scene(rng, h, w, k, grid), (h, w), k))
    print(f"[synth-gate] {args.scenes} scenes, backend={jax.default_backend()}"
          f", bilateral_impl={bilateral_impl}")

    def maps_at_bucket(maps_k, k, bucket):
        """threshold + bilinear upsample, padded to kmax channels —
        the production _finish_maps semantics for the agg variant."""
        padded = np.zeros((1, kmax, grid, grid), np.float32)
        padded[0, :k] = maps_k
        t = masks_mod.threshold_maps(jnp.asarray(padded), base_cfg.threshold)
        up = masks_mod.upsample_maps(t, bucket, bucket, rescale=False)
        return np.asarray(up[0])

    # ----- anchor: host-parity path at exact GT resolution ----------------
    anchor_runner = SegmentationRunner(
        base_cfg, params={}, bucket_size=224, bilateral_impl="reference"
    )
    hist_anchor = np.zeros((n_class, n_class), np.int64)
    t0 = time.perf_counter()
    per_scene_bucket224 = []
    for (gt, rgb, maps), (h, w), k in scenes:
        mb = maps_at_bucket(maps, k, 224)
        per_scene_bucket224.append(mb)
        class_valid = np.arange(kmax) < k
        pred = anchor_runner.finalize_image_parity(
            mb, True, class_valid, list(range(1, k + 1)), rgb, (h, w)
        )
        hist_anchor += fast_hist(gt.flatten(), pred.flatten(), n_class)
    names = [str(i) for i in range(n_class)]
    anchor_miou = scores_from_hist(hist_anchor, names)["Mean IoU"]
    print(f"[synth-gate] anchor (host, exact GT-res CRF) "
          f"mIoU={anchor_miou:.4f}  [{time.perf_counter() - t0:.1f}s]")

    # ----- device grid -----------------------------------------------------
    results = {"anchor_host": float(anchor_miou)}
    failures = []
    for tag, mode, sub, bucket in DEVICE_GRID:
        cfg = dataclasses.replace(
            base_cfg,
            postprocess=dataclasses.replace(
                base_cfg.postprocess,
                bilateral_mode=mode, bilateral_subsample=sub,
            ),
        )
        runner = SegmentationRunner(
            cfg, params={}, bucket_size=bucket,
            bilateral_impl=bilateral_impl,
        )
        hist = np.zeros((n_class, n_class), np.int64)
        t0 = time.perf_counter()
        for idx, ((gt, rgb, maps), (h, w), k) in enumerate(scenes):
            mb = (per_scene_bucket224[idx] if bucket == 224
                  else maps_at_bucket(maps, k, bucket))
            class_valid = np.arange(kmax) < k
            from pnp_ovss_tpu.data.transforms import resize_rgb

            rgb_b = resize_rgb(rgb, (bucket, bucket)).astype(np.float32)
            m = jnp.asarray(mb)[None]
            scale = (bucket / max(h, w)
                     if cfg.postprocess.crf_xy_gt_scale else 1.0)
            labels = runner._post(
                m, m, jnp.asarray([True]), jnp.asarray(class_valid)[None],
                jnp.asarray(rgb_b)[None],
                jnp.asarray([scale], jnp.float32),
            )
            pred = runner.finalize_image(
                np.asarray(labels[0, 1]), list(range(1, k + 1)), (h, w)
            )
            hist += fast_hist(gt.flatten(), pred.flatten(), n_class)
        miou = scores_from_hist(hist, names)["Mean IoU"]
        delta = (miou - anchor_miou) * 100
        ok = abs(delta) <= args.budget
        if not ok:
            failures.append(tag)
        results[tag] = float(miou)
        print(f"[synth-gate] {tag}: mIoU={miou:.4f}  delta={delta:+.3f} pts"
              f"  {'PASS' if ok else 'FAIL'}  "
              f"[{time.perf_counter() - t0:.1f}s]")

    payload = {
        "scenes": args.scenes, "seed": args.seed,
        "backend": jax.default_backend(),
        "bilateral_impl": bilateral_impl,
        "budget_pts": args.budget, "miou": results, "failures": failures,
        "note": "synthetic scenes; measures ONLY the postprocess "
                "approximations (bucket/subsample/bf16/background) vs the "
                "exact host path — not model accuracy",
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=2)
        print(f"[synth-gate] wrote {args.out}")
    print(f"[synth-gate] {'ALL WITHIN' if not failures else 'EXCEEDED'} "
          f"budget ({args.budget} pts): failures={failures}")


if __name__ == "__main__":
    main()
