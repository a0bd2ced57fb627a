#!/bin/bash
# Round-4 session-3 TPU queue: run AFTER the factor sweep + default flip
# (plan.VMEM_BUDGET_MB default set from tpu_vmem_probe/tpu_factor_sweep
# results). Validates + re-times the new default factorizations.
set -u
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  timeout "$tmo" "$@" > "/tmp/r4_$name.log" 2>&1
  echo "--- rc=$? tail:"; tail -3 "/tmp/r4_$name.log"
}

# 1. Fixed VMEM probe (session-2 run failed on a wrong expected value).
run vmem_probe2 1800 python -u benchmarks/tpu_vmem_probe.py

# 2. Hardware grad parity at the sizes whose DEFAULT factorization changed.
run parity_newfactors 7200 env TPU_PARITY_FORCE=1 \
  TPU_PARITY_SIZES=524288,1048576,2097152 python -u benchmarks/tpu_parity.py

# 3. Re-time the new defaults into the grid of record.
run retime_final 7200 python -u benchmarks/benchmark_flashfftconv.py \
  --sizes 524288,1048576,2097152,4194304 \
  --csv benchmarks/results_v5e_r4_final.csv

# 4. Headline line with the new defaults.
run bench2 3600 python -u bench.py

echo "=== round-4 session-3 queue done ($(date -u +%H:%M:%S)) ==="
