#!/bin/bash
# Round-5 session-3 TPU queue (serial, relay-aware) — run AFTER session 2:
#   1. ListOps at LRA scale with the masked mean pool (verdict #2).
#   2. 4M 3-factor A/B: (64,256,256) single-pass vs the pipeline default
#      (the backward now compiles via the fori band loop).
#   3. conv1d grid REDO — the session-2 run was polluted by a concurrent
#      grad-parity job on the chip (rows after 22:35 read 0.74-0.78x on
#      shapes that measure 1.13-1.21x exclusively).
#   4. Pathfinder-32 and retrieval quality runs (verdict #7).
#   5. bench.py headline sanity at HEAD.
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

# Parity at the round-5 DIRECT_MAX=512 flip (direct-DFT default at 256/512).
run parity_direct 3600 env TPU_PARITY_SIZES=256,512 TPU_PARITY_FORCE=1 \
  python -u benchmarks/tpu_parity.py

rm -f benchmarks/listops_v5e.jsonl
run listops_masked 10800 python -u examples/lra/train_listops.py \
  --epochs 28 --log-file benchmarks/listops_v5e.jsonl

run bench_sanity_r5 3600 env BENCH_TIMEOUT=2400 python -u bench.py

run conv1d_grid_redo 7200 python -u benchmarks/benchmark_conv1d.py \
  --csv benchmarks/results_conv1d_v5e_r4.csv

# Grid rows at the flipped sizes (the session-2 attempt was polluted by
# concurrent compile/relay traffic — timings 25x inflated).
run grid_flips_r5 10800 python -u benchmarks/benchmark_flashfftconv.py \
  --sizes 65536,262144,524288,1048576,2097152,4194304 \
  --csv benchmarks/results_v5e_r5.csv

run bench_4m_singlepass 5400 env FLASHFFTCONV_FACTORS=4194304:64,256,256 \
  python -u benchmarks/benchmark_flashfftconv.py --sizes 4194304 \
  --csv benchmarks/results_v5e_r5_4m_singlepass.csv

run pathfinder 10800 python -u examples/lra/train_pathfinder.py \
  --epochs 15 --log-file benchmarks/pathfinder_v5e.jsonl
run retrieval 7200 python -u examples/lra/train_retrieval.py \
  --epochs 10 --log-file benchmarks/retrieval_v5e.jsonl

echo "=== round-5 session-3 queue done ($(date -u +%H:%M:%S)) ==="
