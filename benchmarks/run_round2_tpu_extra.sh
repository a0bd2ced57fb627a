#!/bin/bash
# Second round-2 TPU queue: runs AFTER run_round2_tpu.sh's queue finishes
# (or if it is gone), when the chip is reachable. Same discipline: one TPU
# process at a time. Stages: headline bench, then the new quality runs
# (Pathfinder, Retrieval-protocol, ETT forecasting).
# Usage: bash benchmarks/run_round2_tpu_extra.sh [skip-wait]
set -u
cd "$(dirname "$0")/.."

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((128,128)); print('TPU OK', float(np.asarray((x@x).ravel()[0])))" \
    >/dev/null 2>&1
}

if [ "${1:-}" != "skip-wait" ]; then
  # wait for the primary queue to drain so we never share the chip
  if [ -f /tmp/r2queue.pid ]; then
    while kill -0 "$(cat /tmp/r2queue.pid)" 2>/dev/null; do sleep 120; done
  fi
  echo "primary queue done; waiting for TPU..."
  until probe; do sleep 120; done
fi
echo "TPU is up: $(date)"

echo "=== stage A: headline bench ==="
BENCH_TIMEOUT=3000 timeout 3600 python bench.py > /tmp/r2_bench.log 2>&1
echo "bench rc=$? ($(date))"; tail -1 /tmp/r2_bench.log || true

echo "=== stage B: LRA Pathfinder quality run ==="
timeout 10800 python examples/lra/train_pathfinder.py --epochs 15 \
  --log-file benchmarks/pathfinder_v5e.jsonl > /tmp/r2_pathfinder.log 2>&1
echo "pathfinder rc=$? ($(date))"

echo "=== stage C: Retrieval-protocol quality run ==="
timeout 7200 python examples/lra/train_retrieval.py --epochs 8 \
  --log-file benchmarks/retrieval_v5e.jsonl > /tmp/r2_retrieval.log 2>&1
echo "retrieval rc=$? ($(date))"

echo "=== stage D: ETT forecasting quality run ==="
timeout 5400 python examples/forecasting/train_ett.py --epochs 10 \
  --log-file benchmarks/ett_v5e.jsonl > /tmp/r2_ett.log 2>&1
echo "ett rc=$? ($(date))"

echo "EXTRA ALL DONE $(date)"
