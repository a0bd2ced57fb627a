#!/bin/bash
# Round-5 phase-2 TPU queue: exclusive-chip quality runs, started only after
# the session-4 timing queue (grid/bench/4M A/B) has exited so nothing
# contends with the timed measurements.
#
#   1. HyenaDNA 1M TRAIN — the round-4/5 flagship gap. Flag set = the AOT
#      probe winner: shifts short filter, h/proj chunks, bf16 filter k,
#      nested inner remat, bf16 final norm (the f32 (B,L,D) cast +
#      cotangent is 2 GB at 1M), custom-VJP chunked MLP (removes the
#      2x2 GB fc1/fc2 backward buffers from the scan body).
#   2. ListOps at LRA scale with the validated recipe: PRENORM + warmup.
#      The postnorm runs collapse into the 17% class prior; the prenorm
#      overfit control breaks out after a ~20-epoch plateau
#      (.r5logs/overfit_f32.log), so this runs long.
#   3. Pathfinder-32 with prenorm; 4. retrieval (prenorm Block already).
set -u
cd "$(dirname "$0")/.."
mkdir -p .r5logs

if [ -f /tmp/session4.pid ]; then
  while kill -0 "$(cat /tmp/session4.pid)" 2>/dev/null; do
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

HDNA_FLAGS="--model large-1m --steps 12 --remat --scan-blocks
  --conv-h-chunks 4 --proj-l-chunks 4 --short-filter-impl shifts
  --bf16-filter --inner-remat --bf16-ln-f --mlp-l-chunks 4 --time-steps"
run hdna_1m_train_p2 10800 python -u examples/hyena_dna/train.py \
  $HDNA_FLAGS --log-file benchmarks/hyenadna_v5e.jsonl
if grep -q RESOURCE_EXHAUSTED .r5logs/hdna_1m_train_p2.log 2>/dev/null; then
  # Retry with the memory-minimizing scheduler (longer step, smaller arena).
  run hdna_1m_train_p2_nolhs 10800 python -u examples/hyena_dna/train.py \
    $HDNA_FLAGS --no-lhs --log-file benchmarks/hyenadna_v5e.jsonl
fi

rm -f benchmarks/listops_v5e.jsonl
run listops_prenorm 12600 python -u examples/lra/train_listops.py \
  --epochs 32 --prenorm --warmup-steps 1000 --lr 2e-3 \
  --kernel_dropout 0.2 \
  --log-file benchmarks/listops_v5e.jsonl

run pathfinder_p2 10800 python -u examples/lra/train_pathfinder.py \
  --epochs 15 --prenorm --log-file benchmarks/pathfinder_v5e.jsonl

run retrieval_p2 7200 python -u examples/lra/train_retrieval.py \
  --epochs 10 --log-file benchmarks/retrieval_v5e.jsonl

echo "=== round-5 phase-2 queue done ($(date -u +%H:%M:%S)) ==="
