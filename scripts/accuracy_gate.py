"""Real-checkpoint / real-dataset mIoU gate (VERDICT round-1 items 2+3).

THIS ENVIRONMENT SHIPS NO MODEL WEIGHTS OR DATASETS (zero egress; see
NOTES.md). This script is the ready-to-run gate for when they exist:

  python scripts/accuracy_gate.py \
      --checkpoint /path/model_large_retrieval_flickr.pth \
      --vocab /path/bert-base-uncased-vocab.txt \
      --home_dir /path/data_root   # VOCdevkit/ + GPT4o_classification/
      --save_path /tmp/gate_out [--limit 200]

What it does:
 1. parity run:   cli/segment.py --postprocess_backend host  — per-image
    blur + native permutohedral CRF at exact GT resolution (the
    reference's postprocess, driver :1002-1074). This is the mIoU anchor.
 2. device runs:  the fast on-device path across the approximation grid
    {strided s in (2, 4), nystrom s in (6, 8)} x bucket in (224, 192).
 3. prints a table of mIoU deltas vs the parity run and PASS/FAIL against
    the 0.3-point budget (BASELINE.json north star).

Expected reference-side numbers to compare the parity run against: the
paper's (arXiv 2311.17095) VOC mIoU; the reference pipeline itself is
Run_seg.sh -> Calculate_mIoU.py:204-256.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEVICE_GRID = [
    # (tag, bilateral_mode, subsample, bucket)
    ("strided_s4_b224", "strided", 4, 224),  # shipping default
    ("strided_s2_b224", "strided", 2, 224),
    ("strided_s3_b224", "strided", 3, 224),
    ("strided_s4_b192", "strided", 4, 192),
]


def run_segment(args, out_dir, extra):
    import time

    cmd = [
        sys.executable, "-m", "pnp_ovss_tpu.cli.segment",
        "--data_type", args.data_type,
        "--home_dir", args.home_dir,
        "--save_path", out_dir,
        "--batch_size", str(args.batch_size),
    ]
    if args.checkpoint:
        cmd += ["--checkpoint", args.checkpoint]
    if args.vocab:
        cmd += ["--vocab", args.vocab]
    cmd += (["--limit", str(args.limit)] if args.limit else []) + extra
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    # Tunneled-TPU quirk: attaching too soon after the previous process
    # exits can hang the first dispatch silently (verify SKILL.md).
    time.sleep(args.attach_cooldown)
    subprocess.run(cmd, check=True, env=env, cwd=REPO)


def miou_of(save_path, data_type, subdir):
    from pnp_ovss_tpu.evalx.aggregate import aggregate

    tables = aggregate(save_path, data_type)
    return tables[subdir]["Mean IoU"]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", default=None,
                   help="LAVIS .pth; omit for a RANDOM-weight harness "
                        "smoke (validates the gate machinery only)")
    p.add_argument("--vocab", default=None)
    p.add_argument("--home_dir", required=True)
    p.add_argument("--save_path", required=True)
    p.add_argument("--data_type", default="voc")
    p.add_argument("--batch_size", type=int, default=35)
    p.add_argument("--limit", type=int, default=None,
                   help="subset size (full VOC val = 1449)")
    p.add_argument("--budget", type=float, default=0.3,
                   help="ONE-SIDED budget: fail if mIoU(device) < "
                        "mIoU(parity) - budget (positive deltas are the "
                        "exact-vs-lattice kernel advantage, measured in "
                        "scripts/lattice_vs_exact_crf.py)")
    p.add_argument("--attach_cooldown", type=float, default=75.0,
                   help="seconds to wait before each CLI subprocess "
                        "attaches to the TPU (tunnel hang workaround)")
    args = p.parse_args()

    if not args.checkpoint:
        print("[gate] WARNING: no --checkpoint — random weights; this "
              "validates the HARNESS, not accuracy")

    sys.path.insert(0, REPO)

    # 1. Parity anchor (exact GT-res host CRF).
    parity_dir = os.path.join(args.save_path, "parity_host")
    run_segment(args, parity_dir, ["--postprocess_backend", "host"])
    anchor = miou_of(parity_dir, args.data_type,
                     "all_drop_hist_with_filtered_caption")
    print(f"[gate] parity (host, exact GT-res) mIoU = {anchor:.4f}")

    # 2. Device grid.
    results = {"parity_host": anchor}
    failures = []
    for tag, mode, sub, bucket in DEVICE_GRID:
        out = os.path.join(args.save_path, tag)
        run_segment(args, out, [
            "--bucket_size", str(bucket),
            "--crf_mode", mode,
            "--crf_subsample", str(sub),
        ])
        m = miou_of(out, args.data_type,
                    "all_drop_hist_with_filtered_caption")
        delta = (m - anchor) * 100
        results[tag] = m
        ok = delta >= -args.budget  # one-sided (see --budget help)
        if not ok:
            failures.append(tag)
        print(f"[gate] {tag}: mIoU {m:.4f}  delta {delta:+.2f} pts  "
              f"{'PASS' if ok else 'FAIL'}")

    with open(os.path.join(args.save_path, "gate_results.json"), "w") as f:
        json.dump({"miou": results, "budget_pts": args.budget,
                   "failures": failures}, f, indent=2)
    if failures:
        raise SystemExit(f"gate FAILED for: {failures}")
    print("[gate] all device configs within budget")


if __name__ == "__main__":
    main()
