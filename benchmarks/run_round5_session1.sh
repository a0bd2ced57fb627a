#!/bin/bash
# Round-5 session-1 TPU queue, in verdict priority order:
#   1. HyenaDNA 1M TRAIN step on one chip (scan-blocks + remat) — the r4 OOM.
#   2. fori band-loop validation at 2M (the compile-wall fix): oracle + timing
#      for the single-pass 3-factor candidates whose backwards used to crash
#      the compile helper.
#   3. bwd1m probe re-run (exclusive window; the 18:22 run was contaminated
#      by a concurrent bench.py).
#   4. Small-N direct-DFT A/B (session-7 carryover).
#   5. bench.py headline sanity.
# Relay-aware: probe before each item, sleep out outages. ONE TPU process at
# a time — never start this while another TPU job runs. Logs in .r5logs/.
set -u
cd "$(dirname "$0")/.."
mkdir -p .r5logs

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
  timeout "$tmo" "$@" > ".r5logs/$name.log" 2>&1
  echo "--- rc=$? tail:"; tail -3 ".r5logs/$name.log"
}

# 1. HyenaDNA 1M train: memory first (--time-steps AOT-compiles and prints
#    peak), then the 20-step artifact if it fits.
run hdna_1m_train_scan 7200 python -u examples/hyena_dna/train.py \
  --model large-1m --steps 12 --remat --scan-blocks --time-steps \
  --log-file benchmarks/hyenadna_v5e.jsonl

# 2. fori band-loop at 2M: single-pass candidates vs the pipeline default.
run fori_2m 10800 env FACTOR_SWEEP_SIZES=2097152 \
  python -u benchmarks/tpu_factor_sweep.py

# 3. Clean bwd1m probes (default plan, then the flipped-bwd override).
run bwd1m_clean 3600 python -u benchmarks/tpu_bwd1m_probe.py
run bwd1m_override_clean 7200 env FLASHFFTCONV_BWD_FACTORS=1048576:16,512,128 \
  python -u benchmarks/tpu_bwd1m_probe.py

# 4. Small-N direct-DFT A/B.
run smalln_direct 3600 python -u benchmarks/tpu_smalln_probe.py

# 5. Headline sanity.
run bench_sanity 2700 env BENCH_TIMEOUT=2400 python -u bench.py

echo "=== round-5 session-1 queue done ($(date -u +%H:%M:%S)) ==="
