#!/usr/bin/env bash
# One-shot TPU measurement pass — run when the axon tunnel is healthy.
# Produces: bench_kernels JSON rows (attention XLA-vs-Pallas + conv
# direct-vs-FFT on the chip), the headline bench JSON, and an optional
# profiler trace. Never kill these mid-run (SIGTERM mid-TPU-use wedges
# the tunnel); budget >30 min for cold remote compiles.
#
#   bash scripts/tpu_decision_pass.sh [outdir]
set -euo pipefail
OUT="${1:-/root/repo/tpu_results}"
mkdir -p "$OUT"
cd /root/repo

echo "[1/3] tunnel probe (tiny graph)"
python - <<'EOF' || { echo "TPU unavailable — aborting pass"; exit 1; }
import jax, jax.numpy as jnp
d = jax.devices()
assert d[0].platform != "cpu", d
print("devices:", d)
print("matmul:", float((jnp.ones((256, 256)) @ jnp.ones((256, 256)))[0, 0]))
EOF

echo "[2/3] kernel A/B (attention + conv)"
python bench_kernels.py | tee "$OUT/kernels.jsonl"

echo "[3/5] headline bench (+ trace)"
BENCH_PROFILE_DIR="$OUT/trace" python bench.py | tee "$OUT/bench.json"

echo "[4/5] Pallas merge-scan A/B (oracle-first)"
python scripts/tpu_merge_scan_ab.py || true

echo "[5/5] int8 PTQ serving A/B (oracle-first)"
python scripts/tpu_int8_ab.py || true

echo "done -> $OUT"
echo "next: update docs/KERNEL_NOTES.md with $OUT/kernels.jsonl; if the"
echo "Pallas rows beat XLA, flip attention_impl in default_config.toml;"
echo "recalibrate ACFFT_PENALTY in applecider_tpu/ops/conv1d.py from the"
echo "conv rows."
