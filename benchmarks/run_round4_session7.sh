#!/bin/bash
# Round-4 session-7 TPU queue: conv1d re-measurement after the backward-mode
# retreat (depthwise._bwd_mode — default training path is now XLA's
# grouped-conv AD, the measured bandwidth floor). Relay-aware like session 6;
# MUST only start after run_round4_session6.sh's bash exits (one TPU process
# at a time). Logs in .r4logs/.
set -u
cd "$(dirname "$0")/.."
mkdir -p .r4logs

probe() {
  timeout 120 python - <<'EOF' >/dev/null 2>&1
import numpy as np, jax, jax.numpy as jnp
x = jnp.ones((128, 128))
np.asarray(jax.device_get((x @ x).ravel()[0]))
EOF
}

wait_for_relay() {
  until probe; do
    echo "relay down, sleeping 300s ($(date -u +%H:%M:%S))"
    sleep 300
  done
}

run() {
  local name=$1 tmo=$2; shift 2
  wait_for_relay
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  timeout "$tmo" "$@" > ".r4logs/$name.log" 2>&1
  echo "--- rc=$? tail:"; tail -3 ".r4logs/$name.log"
}

# The session-6 conv1d_default run predates the mode retreat (its process
# imported the old code): its CSV measures Pallas fwd + fused Pallas bwd.
# Keep it as the fused-side A/B evidence under its honest name.
if [ -f benchmarks/results_conv1d_v5e_r4.csv ] && \
   ! [ -f benchmarks/results_conv1d_v5e_fusedbwd.csv ]; then
  mv benchmarks/results_conv1d_v5e_r4.csv benchmarks/results_conv1d_v5e_fusedbwd.csv
fi

# 1. conv1d grid of record at the new default (xla floor under AD,
#    profit-gated Pallas inference forward).
run conv1d_r4_default 3600 python -u benchmarks/benchmark_conv1d.py \
  --csv benchmarks/results_conv1d_v5e_r4.csv

# 2. 1M plain-backward decomposition probe (the one failing ratio bar),
#    then the mix-and-match A/B: forward keeps (8,512,256), backward runs
#    under (16,512,128) via the new bwd-plan override.
run bwd1m_probe 3600 python -u benchmarks/tpu_bwd1m_probe.py
run bwd1m_override 7200 env FLASHFFTCONV_BWD_FACTORS=1048576:16,512,128 \
  python -u benchmarks/tpu_bwd1m_probe.py

# 2b. Small-N A/B: direct-DFT kernel (1-factor plans, now padded-capable)
#     vs the 2-factor Monarch defaults at 256-1024.
run smalln_direct 3600 python -u benchmarks/tpu_smalln_probe.py

# 2c. Targeted factor sweep: small-N direct-vs-Monarch A/B (fwd+bwd) and
#     untried 512K/1M shapes (the 0.25-MFU bar at 512K missed by 7% with
#     the best TRIED plan; every shape oracle-checked).
run factor_sweep_r4s7 14400 env FACTOR_SWEEP_SIZES=256,512,1024,524288,1048576 \
  python -u benchmarks/tpu_factor_sweep.py

# 3. Acceptance bars over the refreshed CSVs.
run check_targets 600 python -u benchmarks/check_targets.py

echo "=== round-4 session-7 queue done ($(date -u +%H:%M:%S)) ==="
