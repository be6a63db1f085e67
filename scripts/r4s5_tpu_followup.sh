#!/bin/bash
# Round-4 session-5 TPU follow-up (fires when the relay returns):
#  1. golden at HEAD (defaults unchanged since the session-4 capture —
#     must be green without regeneration),
#  2. stage profile at the shipping bucket 192 to measure the post
#     (blur+CRF) ms/batch with all three bandwidth knobs default-on —
#     the number that decides VERDICT r3 #6 (CRF bandwidth-floor axis:
#     <= ~1.5x the ~80 ms/batch floor closes it; otherwise write the
#     negative-result ledger entry),
#  3. a driver-grade bench capture at HEAD (336px + 768px lines).
# Strictly serialized with attach cooldowns (one process per chip; a
# too-soon attach hangs silently after backend init).
#
# Usage: bash scripts/r4s5_tpu_followup.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r4s5_followup}
mkdir -p "$OUT"

echo "[r4s5] 1/3 golden at HEAD" >&2
PNP_GOLDEN_TPU=1 timeout 1800 python -m pytest tests/test_golden_tpu.py -q \
  > "$OUT/golden.log" 2>&1
echo "[r4s5] golden rc=$?: $(tail -1 "$OUT/golden.log")" >&2
sleep 90

echo "[r4s5] 2/3 stage profile (bucket 192, knobs default-on)" >&2
BENCH_BUCKET=192 timeout 3600 python scripts/profile_stages.py \
  > "$OUT/stages.log" 2>&1
echo "[r4s5] stages rc=$?" >&2
grep -E "attribution|post|finalize|e2e" "$OUT/stages.log" >&2 || true
sleep 90

echo "[r4s5] 3/3 bench capture at HEAD" >&2
timeout 3600 python bench.py > "$OUT/bench.json" 2> "$OUT/bench.err"
echo "[r4s5] bench rc=$?: $(cat "$OUT/bench.json")" >&2

echo "[r4s5] done -> $OUT" >&2
