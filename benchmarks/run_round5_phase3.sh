#!/bin/bash
# Round-5 phase-3 TPU queue: remaining exclusive timing items, started only
# after the phase-2 quality queue exits.
#   1. conv1d grid of record at the round-4 default dispatch (XLA-AD
#      training path, profit-gated Pallas inference fwd) with the
#      scan-amortized benchmark -> results_conv1d_v5e_r5.csv.
#   2. 64K fftconv re-run: the first grid_flips_r5 rows (09:00-09:02) ran
#      while two stray probe processes shared the chip; re-measure clean.
#   3. 512K fwd-MFU sweep row: (4,512,256) vs the (8,512,128) default,
#      chasing the 0.25 bar (reads 0.238 at the default).
set -u
cd "$(dirname "$0")/.."
mkdir -p .r5logs

if [ -f /tmp/phase2.pid ]; then
  while kill -0 "$(cat /tmp/phase2.pid)" 2>/dev/null; do
    sleep 120
  done
fi

probe() {
  timeout 180 python - <<'PYEOF' >/dev/null 2>&1
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

run conv1d_grid_r5 7200 python -u benchmarks/benchmark_conv1d.py \
  --csv benchmarks/results_conv1d_v5e_r5.csv

run grid_64k_rerun 5400 python -u benchmarks/benchmark_flashfftconv.py \
  --sizes 65536 --csv benchmarks/results_v5e_r5_64k.csv

run sweep_512k_fwd 5400 env FLASHFFTCONV_FACTORS=524288:4,512,256 \
  python -u benchmarks/benchmark_flashfftconv.py --sizes 524288 \
  --csv benchmarks/results_v5e_r5_512k_ab.csv

# Forward/backward plan-split A/Bs: correctness is factorization-
# independent (du/dk leave the kernel in the time domain), so pair the
# fwd-optimal plan with the bwd-optimal override and check both the fwd
# MFU and the total against the single-plan defaults in results_v5e_r5.csv.
run split_1m 5400 env FLASHFFTCONV_FACTORS=1048576:8,512,256 \
  FLASHFFTCONV_BWD_FACTORS=1048576:16,512,128 \
  python -u benchmarks/benchmark_flashfftconv.py --sizes 1048576 \
  --csv benchmarks/results_v5e_r5_split1m.csv

run split_64k 5400 env FLASHFFTCONV_FACTORS=65536:2,256,128 \
  FLASHFFTCONV_BWD_FACTORS=65536:4,128,128 \
  python -u benchmarks/benchmark_flashfftconv.py --sizes 65536 \
  --csv benchmarks/results_v5e_r5_split64k.csv

echo "=== round-5 phase-3 queue done ($(date -u +%H:%M:%S)) ==="
