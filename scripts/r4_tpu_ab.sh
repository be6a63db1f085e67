#!/bin/bash
# Round-4 TPU evidence session (VERDICT r3 #1/#3/#7): run the golden at
# HEAD, then A/B the two outage-committed default changes (qkv-view
# attention, bb batch-grouping) and the kt_quantize knob END TO END, then
# the 768px leg. Strictly serialized; ~75s gaps ride bench.py's own
# attach-settle. Results land as one JSON line per leg in $OUT.
#
# Usage: bash scripts/r4_tpu_ab.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r4_ab}
mkdir -p "$OUT"

run_leg() {  # name, env pairs...
  local name=$1; shift
  echo "[r4_ab] leg $name ($(date +%H:%M:%S))" >&2
  env "$@" BENCH_768=0 timeout 3600 python bench.py \
    > "$OUT/$name.json" 2> "$OUT/$name.err"
  echo "[r4_ab] $name -> $(tail -1 "$OUT/$name.json")" >&2
  # Full attach cooldown BEFORE the next leg's probe child attaches (a
  # too-soon attach can hang silently; bench's own settle only runs
  # after its probe already succeeded).
  sleep 90
}

echo "[r4_ab] 1/3 golden at HEAD (production numerics)" >&2
PNP_GOLDEN_TPU=1 timeout 1800 python -m pytest tests/test_golden_tpu.py -q \
  > "$OUT/golden.log" 2>&1
golden_rc=$?
echo "[r4_ab] golden rc=$golden_rc: $(tail -1 "$OUT/golden.log")" >&2
sleep 75

echo "[r4_ab] 2/3 336px A/B legs" >&2
run_leg default
run_leg qkv_sliced PNP_FLASH_QKV=0
run_leg bb_off     PNP_FLASH_BB=1
run_leg kt_q       PNP_CRF_KT_Q=1
run_leg crf_fold   PNP_CRF_FOLD=1
run_leg crf_bf16   PNP_CRF_STATE=bf16
run_leg crf_all    PNP_CRF_KT_Q=1 PNP_CRF_FOLD=1 PNP_CRF_STATE=bf16

echo "[r4_ab] 3/3 768px legs" >&2
run_leg px768_default    BENCH_IMG_SIZE=768
run_leg px768_qkv_sliced BENCH_IMG_SIZE=768 PNP_FLASH_QKV=0

if [ "${SKIP_GATE:-0}" != "1" ]; then
  echo "[r4_ab] 5-seed gate for the combined CRF knobs (long)" >&2
  PNP_CRF_KT_Q=1 PNP_CRF_FOLD=1 PNP_CRF_STATE=bf16 \
    timeout 5400 python scripts/synthetic_postprocess_gate.py \
    --configs strided_s4_b192 --seeds 0,1,2,3,4 --scenes 48 \
    --out "$OUT/gate_crf_knobs.json" > "$OUT/gate_crf_knobs.log" 2>&1
  echo "[r4_ab] gate rc=$? -> $OUT/gate_crf_knobs.json" >&2
fi

{
  echo "## r4 TPU A/B session ($(date -u +%Y-%m-%dT%H:%MZ))"
  echo "- golden at HEAD: rc=$golden_rc"
  for f in default qkv_sliced bb_off kt_q crf_fold crf_bf16 crf_all \
           px768_default px768_qkv_sliced; do
    echo "- $f: $(tail -1 "$OUT/$f.json" 2>/dev/null)"
  done
} | tee "$OUT/summary.md"
