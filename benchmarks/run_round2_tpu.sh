#!/bin/bash
# Round-2 TPU workload queue. Waits for the chip (the axon relay has been
# observed to drop and come back), then runs each stage sequentially —
# never two TPU processes at once (shared-chip timings inflate 3-7x).
# Usage:  bash benchmarks/run_round2_tpu.sh [skip-wait]
# Logs per stage under /tmp/r2_*.log; artifacts under benchmarks/.
set -u
cd "$(dirname "$0")/.."

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((128,128)); print('TPU OK', float(np.asarray((x@x).ravel()[0])))" \
    >/dev/null 2>&1
}

if [ "${1:-}" != "skip-wait" ]; then
  echo "waiting for TPU..."
  until probe; do sleep 120; done
fi
echo "TPU is up: $(date)"

echo "=== stage 1: conv1d sweep ==="
timeout 3600 python benchmarks/benchmark_conv1d.py > /tmp/r2_conv1d.log 2>&1
echo "conv1d rc=$? ($(date))"

echo "=== stage 2: fftconv grid sweep ==="
timeout 10800 python benchmarks/benchmark_flashfftconv.py \
  --csv benchmarks/results_v5e.csv > /tmp/r2_grid.log 2>&1
echo "grid rc=$? ($(date))"

echo "=== stage 3: seqcls quality run ==="
timeout 7200 python examples/seqcls/train.py --epochs 10 \
  --log-file benchmarks/seqcls_v5e.jsonl > /tmp/r2_seqcls.log 2>&1
echo "seqcls rc=$? ($(date))"

echo "=== stage 4: LRA ListOps quality run ==="
timeout 10800 python examples/lra/train_listops.py --epochs 20 \
  --log-file benchmarks/listops_v5e.jsonl > /tmp/r2_listops.log 2>&1
echo "listops rc=$? ($(date))"

echo "ALL DONE $(date)"
