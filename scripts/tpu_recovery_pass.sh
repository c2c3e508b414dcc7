#!/usr/bin/env bash
# Round-3 late-session recovery runbook — everything queued while the
# tunnel was down, in one sequenced pass. Run detached and poll the log:
#
#   nohup bash scripts/tpu_recovery_pass.sh > /tmp/recovery_pass.log 2>&1 &
#
# Never SIGTERM/SIGKILL any stage mid-run (wedges the tunnel).
set -uo pipefail
OUT="${1:-/root/repo/tpu_results}"
mkdir -p "$OUT"
cd /root/repo

echo "=== [0] tunnel probe"
python - <<'EOF' || { echo "TPU unavailable — aborting"; exit 1; }
import jax, jax.numpy as jnp, numpy as np
d = jax.devices()
assert d[0].platform != "cpu", d
print("devices:", d)
print("matmul:", float(np.asarray((jnp.ones((256, 256)) @ jnp.ones((256, 256)))[0, 0])))
EOF

echo "=== [1] headline bench (new columns: binned frac03, int8 A/B, train)"
python bench.py | tee "$OUT/bench_r3_late.json"

echo "=== [2] device-preprocess stage costs (fused merge scan)"
python scripts/tpu_preprocess_cost.py | tee "$OUT/preprocess_cost_late.json" || true

echo "=== [3] int8 standalone A/B"
python scripts/tpu_int8_ab.py || true

echo "=== [3b] Pallas merge-scan A/B (oracle first)"
python scripts/tpu_merge_scan_ab.py || true

echo "=== [4] train-step probe (rbg dropout RNG)"
python scripts/tpu_train_probe.py | tee "$OUT/train_step_late.jsonl" || true

echo "=== recovery pass done -> $OUT"
