#!/bin/bash
# Third round-2 TPU queue: runs AFTER run_round2_tpu_extra.sh's queue
# finishes (or if it is gone), when the chip is reachable. One TPU process
# at a time. Stages: flash-attention hardware checks (now including the
# ALiBi / sliding-window / blocksparse variants), then a parity refresh.
# Usage: bash benchmarks/run_round2_tpu_extra2.sh [skip-wait]
set -u
cd "$(dirname "$0")/.."

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((128,128)); print('TPU OK', float(np.asarray((x@x).ravel()[0])))" \
    >/dev/null 2>&1
}

if [ "${1:-}" != "skip-wait" ]; then
  for pidfile in /tmp/r2queue.pid /tmp/r2extra.pid; do
    if [ -f "$pidfile" ]; then
      while kill -0 "$(cat "$pidfile")" 2>/dev/null; do sleep 120; done
    fi
  done
  echo "prior queues done; waiting for TPU..."
  until probe; do sleep 120; done
fi
echo "TPU is up: $(date)"

echo "=== stage I: flash-attention hardware checks ==="
timeout 3600 python benchmarks/tpu_attention.py > /tmp/r2_attn.log 2>&1
echo "attention rc=$? ($(date))"

echo "=== stage II: attention benchmark sweep ==="
timeout 5400 python benchmarks/benchmark_attention.py > /tmp/r2_attn_bench.log 2>&1
echo "attention bench rc=$? ($(date))"

echo "EXTRA2 ALL DONE $(date)"
