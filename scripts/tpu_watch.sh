#!/usr/bin/env bash
# Poll the axon TPU tunnel; on recovery run the one-shot decision pass.
# The known outage mode is a ~30-min hang then UNAVAILABLE, so each probe
# attempt gets a generous timeout and the loop cadence is naturally slow.
#
#   bash scripts/tpu_watch.sh [logfile]
set -u
LOG="${1:-/tmp/tpu_health_r3.log}"
cd /root/repo
try=0
while true; do
  try=$((try + 1))
  ts() { date +%H:%M:%S; }
  out=$(timeout 2100 python - <<'EOF' 2>&1
import jax, jax.numpy as jnp
d = jax.devices()
assert d[0].platform != "cpu", d
y = (jnp.ones((256, 256)) @ jnp.ones((256, 256))).block_until_ready()
print("TPU_HEALTHY", d)
EOF
)
  rc=$?
  echo "$(ts) try${try} rc=${rc}: $(echo "$out" | grep -E 'TPU_HEALTHY|Error|error|UNAVAILABLE' | head -1)" >> "$LOG"
  if echo "$out" | grep -q TPU_HEALTHY; then
    echo "$(ts) tunnel healthy -> decision pass" >> "$LOG"
    bash scripts/tpu_decision_pass.sh /root/repo/tpu_results >> "$LOG" 2>&1
    echo "$(ts) decision pass rc=$?" >> "$LOG"
    exit 0
  fi
  sleep 600
done
