#!/usr/bin/env bash
# Round-5 batch sweep, part 2 (TPU, serialized — quiet host only).
#
# Part 1 found B=40/48 failed to COMPILE: the batch-group auto's 8 MB
# estimate cap admitted bb=8 at s_pad 448, whose real scoped-VMEM stack
# is 16.29 MB (300 KB over the 16 MB limit). After the calibrated 7 MB
# cap, B=40 -> bb=5 and B=48 -> bb=6; the more promising legs keep the
# TPU-proven bb=7 grouping at larger batch: B=42/49/56 (divisible by 7).
# Control B=35/bb=7 runs in the SAME session to bracket tunnel noise.
#
# Usage: bash scripts/r5_bsweep2.sh [outdir]   (default /tmp/r5_bsweep2)
set -u
out="${1:-/tmp/r5_bsweep2}"
mkdir -p "$out"
cd "$(dirname "$0")/.."

leg() {  # name batch
  local name="$1" batch="$2"
  echo "=== leg $name (img=336 B=$batch) $(date -u +%H:%M:%SZ)" \
    | tee -a "$out/summary.log"
  BENCH_IMG_SIZE=336 BENCH_BATCH="$batch" BENCH_768=0 \
    timeout 2400 python bench.py >"$out/$name.log" 2>&1
  echo "rc=$? $(grep -h '^{' "$out/$name.log" | tail -1)" \
    | tee -a "$out/summary.log"
}

leg ctl_b35 35
leg b42     42
leg b49     49
leg b40     40
leg b48     48
leg b56     56
echo "DONE $(date -u +%H:%M:%SZ)" | tee -a "$out/summary.log"
