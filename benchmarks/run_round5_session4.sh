#!/bin/bash
# Round-5 session-4 TPU queue (serial, relay-aware), in verdict priority
# order. Run AFTER the session-2/3 items that already landed:
#   1. HyenaDNA 1M TRAIN attempt with the full round-5 lever stack
#      (shifts short filter, h/proj chunks, bf16 filter k + filter MLP,
#      nested inner remat, recompute-in-backward xent). Static probe at
#      HEAD reads ~15.7 G vs 15.75 G — attempt and record either way.
#   2. ListOps full scale with warmup (the no-warmup run collapsed into
#      the class prior; the warmup probe shows a slow but steady descent).
#   3. fftconv grid of record at the round-5 default plans
#      -> results_v5e_r5.csv (64K dip, 512K bar, 1M flip, 2M single-pass).
#   4. bench.py headline sanity at HEAD.
#   5. 4M single-pass A/B vs the pipeline default.
#   6. Pathfinder-32 / retrieval quality runs (now with warmup).
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

run hdna_1m_train_r5 10800 python -u examples/hyena_dna/train.py \
  --model large-1m --steps 12 --remat --scan-blocks \
  --conv-h-chunks 4 --proj-l-chunks 4 --short-filter-impl shifts \
  --bf16-filter --bf16-filter-mlp --inner-remat --time-steps \
  --log-file benchmarks/hyenadna_v5e.jsonl

run grid_flips_r5 10800 python -u benchmarks/benchmark_flashfftconv.py \
  --sizes 65536,262144,524288,1048576,2097152,4194304 \
  --csv benchmarks/results_v5e_r5.csv

run bench_sanity_r5 3600 env BENCH_TIMEOUT=2400 python -u bench.py

run bench_4m_singlepass 5400 env FLASHFFTCONV_FACTORS=4194304:64,256,256 \
  python -u benchmarks/benchmark_flashfftconv.py --sizes 4194304 \
  --csv benchmarks/results_v5e_r5_4m_singlepass.csv

# LRA quality runs (listops/pathfinder/retrieval) run separately once the
# learning recipe is validated at small scale — see run_round5_lra.sh.

echo "=== round-5 session-4 queue done ($(date -u +%H:%M:%S)) ==="
