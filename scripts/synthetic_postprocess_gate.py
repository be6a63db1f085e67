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

  anchor : the host-parity path — grid-resolution thresholded maps,
           ONE bilinear resize to GT resolution (reference :358-360),
           f32 blur, native permutohedral DenseCRF at exact GT res —
           the reference's semantics, and
  grid   : the production device path (SegmentationRunner._post at the
           bucket + nearest upsample) across the approximation grid,

and reports mIoU deltas against the anchor and the 0.3-point budget
(BASELINE.json north star). Scene-distribution variance is ~1 mIoU point
per seed (round-2 finding), 3x the budget — so the verdict is taken over
MULTIPLE seeds: per config the gate reports per-seed deltas, their mean
and range.

The budget is ONE-SIDED: a config FAILS if its mean delta < -budget
(device loses accuracy vs reference semantics); positive deltas are
reported but are not failures. Round-3 finding (5 seeds x 48 scenes,
decomposed in NOTES.md): the device path beats the bit-faithful host
anchor by +0.7..+2.9 pts on EVERY config and seed, because (a) the
device bilateral is the exact Gaussian kernel while the reference's
pydensecrf/permutohedral lattice only approximates it, and (b) per-axis
GT-relative spatial scaling (+1.1 pts vs isotropic) removes the
short-axis under-smoothing of non-square images. "Within 0.3" as a
two-sided band would force emulating the lattice's approximation error —
the north star is accuracy parity-or-better, not bug-for-bug CRF
emulation (the quirk ledger in NOTES.md covers semantics we DO
reproduce). Run on the TPU for production numbers (pallas bilateral +
bf16) or on CPU (reference bilateral):

  python scripts/synthetic_postprocess_gate.py --scenes 48 \
      --seeds 0,1,2,3,4 --out SYNTH_GATE.json
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
    from pnp_ovss_tpu.ops.host_post import resize_bilinear_np

    return resize_bilinear_np(x, h, w)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scenes", type=int, default=48)
    p.add_argument("--max_k", type=int, default=6)
    p.add_argument("--seeds", default="0,1,2,3,4",
                   help="comma-separated scene-distribution seeds; the "
                        "verdict is mean-over-seeds")
    p.add_argument("--budget", type=float, default=0.3)
    p.add_argument("--out", default=None)
    p.add_argument("--configs", default=None,
                   help="comma-separated subset of config tags to run")
    p.add_argument("--cpu", action="store_true",
                   help="pin to CPU (reference bilateral impl)")
    args = p.parse_args()

    # Line-buffer stdout so progress survives nohup/file redirection, and
    # arm a watchdog traceback — the axon tunnel can hang a dispatch
    # silently and a 3-hour run with no output is undebuggable.
    import faulthandler

    sys.stdout.reconfigure(line_buffering=True)
    faulthandler.dump_traceback_later(1200, repeat=True, file=sys.stderr)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from pnp_ovss_tpu.config import PipelineConfig
    from pnp_ovss_tpu.data.transforms import resize_rgb
    from pnp_ovss_tpu.evalx.metrics import fast_hist, scores_from_hist
    from pnp_ovss_tpu.pipeline import masks as masks_mod
    from pnp_ovss_tpu.pipeline.runner import SegmentationRunner

    on_tpu = jax.default_backend() not in ("cpu",)
    bilateral_impl = "pallas" if on_tpu else "reference"
    base_cfg = PipelineConfig()  # reference constants (threshold, CRF, ...)
    grid = base_cfg.model.vit.grid
    kmax = base_cfg.max_classes
    n_class = args.max_k + 1
    names = [str(i) for i in range(n_class)]
    seeds = [int(s) for s in args.seeds.split(",")]
    device_grid = DEVICE_GRID
    if args.configs:
        keep = set(args.configs.split(","))
        device_grid = [c for c in DEVICE_GRID if c[0] in keep]

    print(f"[synth-gate] {args.scenes} scenes x seeds {seeds}, "
          f"backend={jax.default_backend()}, bilateral_impl={bilateral_impl}")

    def threshold_grid(maps_k, k):
        """Production threshold semantics at grid resolution, padded to
        kmax channels — the maps the parity anchor resizes grid->GT in
        one step and _finish_maps upsamples to the bucket."""
        padded = np.zeros((1, kmax, grid, grid), np.float32)
        padded[0, :k] = maps_k
        t = masks_mod.threshold_maps(jnp.asarray(padded), base_cfg.threshold)
        return np.asarray(t[0])

    def upsample_bucket(tgrid, bucket):
        up = masks_mod.upsample_maps(
            jnp.asarray(tgrid)[None], bucket, bucket, rescale=False
        )
        return np.asarray(up[0])

    anchor_runner = SegmentationRunner(
        base_cfg, params={}, bucket_size=224, bilateral_impl="reference"
    )
    runners = {}
    for tag, mode, sub, bucket in device_grid:
        cfg = dataclasses.replace(
            base_cfg,
            postprocess=dataclasses.replace(
                base_cfg.postprocess,
                bilateral_mode=mode, bilateral_subsample=sub,
            ),
        )
        runners[tag] = SegmentationRunner(
            cfg, params={}, bucket_size=bucket, bilateral_impl=bilateral_impl,
        )

    # miou[seed][tag] and miou[seed]["anchor_host"]
    miou = {}
    for seed in seeds:
        rng = np.random.RandomState(seed)
        scenes = []
        for i in range(args.scenes):
            h, w = SIZES[i % len(SIZES)]
            k = int(rng.randint(2, args.max_k + 1))
            scenes.append((make_scene(rng, h, w, k, grid), (h, w), k))
        tgrids = [threshold_grid(maps, k) for (gt, rgb, maps), _, k in scenes]

        # ----- anchor: host-parity path at exact GT resolution -----------
        t0 = time.perf_counter()
        hist_anchor = np.zeros((n_class, n_class), np.int64)
        for i, (tg, ((gt, rgb, maps), (h, w), k)) in enumerate(
                zip(tgrids, scenes)):
            class_valid = np.arange(kmax) < k
            pred = anchor_runner.finalize_image_parity(
                tg, True, class_valid, list(range(1, k + 1)), rgb, (h, w),
                rescale=False,
            )
            hist_anchor += fast_hist(gt.flatten(), pred.flatten(), n_class)
            if (i + 1) % 12 == 0:
                print(f"[synth-gate]   anchor {i + 1}/{len(scenes)} "
                      f"[{time.perf_counter() - t0:.0f}s]")
        anchor = scores_from_hist(hist_anchor, names)["Mean IoU"]
        miou[seed] = {"anchor_host": float(anchor)}
        print(f"[synth-gate] seed {seed} anchor (host, exact GT-res CRF) "
              f"mIoU={anchor:.4f}  [{time.perf_counter() - t0:.1f}s]")

        # ----- device grid ----------------------------------------------
        for tag, mode, sub, bucket in device_grid:
            runner = runners[tag]
            cfg = runner.cfg
            hist = np.zeros((n_class, n_class), np.int64)
            t0 = time.perf_counter()
            for tg, ((gt, rgb, maps), (h, w), k) in zip(tgrids, scenes):
                mb = upsample_bucket(tg, bucket)
                class_valid = np.arange(kmax) < k
                rgb_b = resize_rgb(rgb, (bucket, bucket)).astype(np.float32)
                m = jnp.asarray(mb)[None]
                if cfg.postprocess.crf_xy_gt_scale:
                    scale = np.asarray(
                        [[bucket / w, bucket / h]], np.float32
                    )
                else:
                    scale = np.ones((1, 2), np.float32)
                labels = runner._post(
                    m, m, jnp.asarray([True]),
                    jnp.asarray(class_valid)[None],
                    jnp.asarray(rgb_b)[None], jnp.asarray(scale),
                )
                pred = runner.finalize_image(
                    np.asarray(labels[0, 1]), list(range(1, k + 1)), (h, w)
                )
                hist += fast_hist(gt.flatten(), pred.flatten(), n_class)
            m_val = scores_from_hist(hist, names)["Mean IoU"]
            miou[seed][tag] = float(m_val)
            print(f"[synth-gate] seed {seed} {tag}: mIoU={m_val:.4f}  "
                  f"delta={(m_val - anchor) * 100:+.3f} pts  "
                  f"[{time.perf_counter() - t0:.1f}s]")

    # ----- aggregate over seeds ------------------------------------------
    stats, failures, marginal = {}, [], []
    for tag, *_ in device_grid:
        deltas = [
            (miou[s][tag] - miou[s]["anchor_host"]) * 100 for s in seeds
        ]
        mean = float(np.mean(deltas))
        lo, hi = float(np.min(deltas)), float(np.max(deltas))
        ok = mean >= -args.budget  # one-sided: fail only on regression
        worst_ok = lo >= -args.budget
        stats[tag] = {
            "deltas_pts": [round(d, 3) for d in deltas],
            "mean_pts": round(mean, 3),
            "range_pts": [round(lo, 3), round(hi, 3)],
            "pass_mean": ok, "pass_worst_seed": worst_ok,
        }
        if not ok:
            failures.append(tag)
        elif not worst_ok:
            marginal.append(tag)
        print(f"[synth-gate] {tag}: mean {mean:+.3f} pts, "
              f"range [{lo:+.3f}, {hi:+.3f}] over {len(seeds)} seeds  "
              f"{'PASS' if ok else 'FAIL'}"
              f"{' (marginal: worst seed below -budget)' if ok and not worst_ok else ''}")

    payload = {
        "scenes": args.scenes, "seeds": seeds,
        "backend": jax.default_backend(),
        "bilateral_impl": bilateral_impl,
        "budget_pts": args.budget,
        "miou_by_seed": miou, "stats": stats,
        "failures_mean": failures, "marginal_worst_seed": marginal,
        "note": "synthetic scenes; measures ONLY the postprocess "
                "approximations (bucket/subsample/bf16/background) vs the "
                "single-resample exact-GT-res host anchor — not model "
                "accuracy. ONE-SIDED verdict: fail if mean delta over "
                "seeds < -budget (accuracy regression vs reference "
                "semantics). Positive deltas are systematic and "
                "explained: exact device bilateral vs the reference's "
                "permutohedral-lattice approximation (+ per-axis spatial "
                "scaling); see NOTES.md round-3 decomposition.",
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=2)
        print(f"[synth-gate] wrote {args.out}")
    print(f"[synth-gate] mean-delta verdict over {len(seeds)} seeds: "
          f"{'ALL WITHIN' if not failures else 'EXCEEDED'} budget "
          f"({args.budget} pts): failures={failures} marginal={marginal}")


if __name__ == "__main__":
    main()
