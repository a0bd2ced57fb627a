#!/bin/bash
# Round-5 session-2 TPU queue (serial, relay-aware):
#   1. tpu_parity at the NEW defaults (1M (16,512,128), 2M (32,256,256)
#      single-pass) — numerics gate for the round-5 plan flips.
#   2. conv1d grid of record under the retuned profit gate
#      (_pallas_profitable: D>=1024 AND L*D>=4M).
#   3. Small-N direct-DFT A/B (session-7 carryover, round-4 verdict #3).
#   4. fftconv grid rows at the flipped sizes -> results_v5e_r5.csv.
set -u
cd "$(dirname "$0")/.."
mkdir -p .r5logs

probe() {
  timeout 120 python - <<'PYEOF' >/dev/null 2>&1
import numpy as np, jax, jax.numpy as jnp
x = jnp.ones((128, 128))
np.asarray(jax.device_get((x @ x).ravel()[0]))
PYEOF
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

run parity_flips 10800 python -u benchmarks/tpu_parity.py
run conv1d_grid_r5 7200 python -u benchmarks/benchmark_conv1d.py \
  --csv benchmarks/results_conv1d_v5e_r4.csv
run smalln_direct 5400 python -u benchmarks/tpu_smalln_probe.py
run grid_flips_r5 10800 python -u benchmarks/benchmark_flashfftconv.py \
  --sizes 65536,262144,524288,1048576,2097152,4194304 \
  --csv benchmarks/results_v5e_r5.csv

echo "=== round-5 session-2 queue done ($(date -u +%H:%M:%S)) ==="
