#!/bin/bash
# Round-entry ritual (VERDICT r3 #8): asset probe -> test suite ->
# on-device golden -> driver bench, STRICTLY SERIALIZED (the axon host
# has one CPU core; concurrent heavy jobs thrash each other and bench
# numbers collapse). Bench refuses to run if the suite or the golden
# failed — a perf number from a broken tree is worse than none.
#
# Usage: bash scripts/round_entry.sh [outdir]
#   SKIP_SUITE=1   skip the full pytest run (use only if it already ran
#                  green this session; the golden still runs)
#   SKIP_BENCH=1   stop after the golden (e.g. mid-outage)
#
# Output: one NOTES-ready markdown summary block on stdout (also saved
# to $OUT/summary.md); full logs under $OUT/.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/round_entry_$(date +%Y%m%d_%H%M)}
mkdir -p "$OUT"
SUMMARY="$OUT/summary.md"

assets_rc=1 suite_rc=- golden_rc=1 bench_rc=-
suite_tail="(skipped)" golden_tail="" bench_line="(not run)"

echo "[round_entry] 1/4 asset probe" >&2
python scripts/check_assets.py > "$OUT/assets.log" 2>&1
assets_rc=$?
assets_line=$(grep -E "accuracy gate runnable" "$OUT/assets.log" | tail -1)
if [ -n "$assets_line" ] && ! echo "$assets_line" | grep -q "none"; then
  # CLAUDE.md round-entry rule: if a dataset goes ready, the accuracy
  # gate runs IMMEDIATELY. The gate needs per-dataset paths this script
  # cannot guess, so stop loudly instead of burying the event.
  echo "!!! ASSETS READY: $assets_line" | tee -a "$SUMMARY" >&2
  echo "!!! Run scripts/run_accuracy_gate.sh <dataset> ... NOW" \
    | tee -a "$SUMMARY" >&2
fi

if [ "${SKIP_SUITE:-0}" != "1" ]; then
  echo "[round_entry] 2/4 test suite (30-45 min on the 1-core host)" >&2
  timeout 3600 python -m pytest tests/ -q > "$OUT/pytest.log" 2>&1
  suite_rc=$?
  suite_tail=$(tail -1 "$OUT/pytest.log")
else
  suite_rc=0
  suite_tail="(SKIP_SUITE=1)"
fi

echo "[round_entry] 3/4 TPU golden (file alone, production numerics)" >&2
PNP_GOLDEN_TPU=1 timeout 1800 python -m pytest tests/test_golden_tpu.py -q \
  > "$OUT/golden.log" 2>&1
golden_rc=$?
golden_tail=$(tail -1 "$OUT/golden.log")

if [ "${SKIP_BENCH:-0}" = "1" ]; then
  bench_line="(SKIP_BENCH=1)"
elif [ "$suite_rc" != "0" ] || [ "$golden_rc" != "0" ]; then
  bench_line="(REFUSED: suite rc=$suite_rc golden rc=$golden_rc — fix first)"
  bench_rc=97
else
  echo "[round_entry] 4/4 bench (quiet host required)" >&2
  timeout 7200 python bench.py > "$OUT/bench.json" 2> "$OUT/bench.err"
  bench_rc=$?
  # bench.py prints one line per leg (336px headline, then 768px);
  # record them all — tail -1 alone would report the 768px figure as
  # the round-entry throughput.
  bench_line=$(paste -sd' | ' "$OUT/bench.json")
fi

{
  echo "## Round-entry checklist ($(date -u +%Y-%m-%dT%H:%MZ), logs: $OUT)"
  echo "- assets: ${assets_line:-probe failed rc=$assets_rc}"
  echo "- suite: $suite_tail (rc=$suite_rc)"
  echo "- golden: $golden_tail (rc=$golden_rc)"
  echo "- bench: $bench_line (rc=$bench_rc)"
} | tee "$SUMMARY"

[ "$golden_rc" = "0" ] && [ "$suite_rc" = "0" ]
