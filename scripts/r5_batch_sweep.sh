#!/usr/bin/env bash
# Round-5 batch-size sweep (TPU, serialized — run on a quiet host only).
#
# The round-5 batch-group auto picks the largest divisor of B <= 8 under
# the VMEM budget: the default B=35 lands on bb=7, while B=40/48 land on
# bb=8 (and divide the MXU-friendly 8-lane batch tiling evenly). At
# 768px the default B=8 was never swept at the proj-fold defaults.
# Controls run in the SAME session so tunnel noise brackets the legs.
#
# Usage: bash scripts/r5_batch_sweep.sh [outdir]   (default /tmp/r5_bsweep)
set -u
out="${1:-/tmp/r5_bsweep}"
mkdir -p "$out"
cd "$(dirname "$0")/.."

leg() {  # name img_size batch
  local name="$1" size="$2" batch="$3"
  echo "=== leg $name (img=$size B=$batch) $(date -u +%H:%M:%SZ)" \
    | tee -a "$out/summary.log"
  BENCH_IMG_SIZE="$size" BENCH_BATCH="$batch" BENCH_768=0 \
    timeout 2400 python bench.py >"$out/$name.log" 2>&1
  echo "rc=$? $(grep -h '^{' "$out/$name.log" | tail -1)" \
    | tee -a "$out/summary.log"
}

leg ctl336_b35 336 35
leg b40_336    336 40
leg b48_336    336 48
leg ctl768_b8  768 8
leg b12_768    768 12
leg b16_768    768 16
echo "DONE $(date -u +%H:%M:%SZ)" | tee -a "$out/summary.log"
