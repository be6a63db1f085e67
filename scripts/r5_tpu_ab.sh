#!/bin/bash
# Round-5 queued TPU A/B session: fired by the probe loop the moment the
# relay returns (see NOTES.md round-5 ledger). Serialized — the axon host
# has ONE CPU core. Results land in /tmp/r5_ab/.
set -u
cd /root/repo
OUT=/tmp/r5_ab
mkdir -p "$OUT"

run_bench () {  # name, env pairs...
  local name=$1; shift
  echo "== $name ($(date -u +%H:%M:%SZ)) =="
  env "$@" timeout 2400 python bench.py > "$OUT/$name.log" 2>&1
  echo "rc=$? $(grep -o '{.*}' "$OUT/$name.log" | tr '\n' ' ')"
  sleep 75  # attach cooldown between processes
}

echo "r5 TPU A/B session start $(date -u)"

# 1. proj-fold (attention+proj+residual fused kernel), both legs
run_bench proj_on        PNP_FLASH_PROJ=1
# 2. proj-fold head-group sweep at 336 (auto picks hb=8)
run_bench proj_hb4       PNP_FLASH_PROJ=1 PNP_FLASH_PROJ_HB=4 BENCH_768=0
# 3. batch-group 7 on the default kernel (s_pad 448 freed VMEM), 336 only
run_bench bb7            PNP_FLASH_BB=7 BENCH_768=0
# 4. ln_matmul row block 896 (weight-refetch cut), 336 only
run_bench lnqkv_bm896    PNP_LNQKV_BM=896 BENCH_768=0
# 5. control at HEAD defaults (same session, for noise bracketing)
run_bench control        BENCH_768=0

echo "r5 TPU A/B session done $(date -u)"
grep -o '{.*}' "$OUT"/*.log | sed 's#/tmp/r5_ab/##'
