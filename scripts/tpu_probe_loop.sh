#!/bin/bash
# TPU relay probe loop (rounds 3-5 outage pattern): probe the axon attach
# at PROCESS level every ~9 min; on the first green dispatch, wait out the
# attach cooldown and any host-side heavy job (flagged by /tmp/host_busy),
# then fire the queued A/B session. The 1-core host must never run the
# bench concurrently with pytest/gate work (CLAUDE.md).
#
# Usage: bash scripts/tpu_probe_loop.sh <session-script> [logfile]
set -u
cd "$(dirname "$0")/.."
SESSION=${1:?session script}
LOG=${2:-/tmp/tpu_probe_r5.log}

while true; do
  if timeout 180 python - >> "$LOG" 2>&1 <<'EOF'
import numpy as np, jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
# checksum in f32 (a bf16 accumulation rounds at 2^24-scale sums)
y = np.asarray(jnp.dot(x, x), np.float32)
assert float(y.sum()) == 256.0 * 256 * 256
print("dispatch ok:", jax.devices())
EOF
  then
    echo "[probe] GREEN $(date -u)" >> "$LOG"
    sleep 90  # attach cooldown before the session's first process
    while [ -e /tmp/host_busy ]; do
      echo "[probe] host busy, waiting $(date -u)" >> "$LOG"
      sleep 120
    done
    bash "$SESSION" >> "$LOG.session" 2>&1
    echo "[probe] session done rc=$? $(date -u)" >> "$LOG"
    break
  fi
  echo "[probe] down $(date -u)" >> "$LOG"
  sleep 540
done
