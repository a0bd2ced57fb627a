#!/bin/bash
# Round-3 session-2 follow-up queue — run AFTER run_round3_session2.sh.
# Validates + measures the bf16-spectra 4-factor backward, then probes the
# small-N per-call overhead. ONE TPU process at a time.
set -u
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  timeout "$tmo" "$@" > "/tmp/r3_$name.log" 2>&1
  echo "--- rc=$? tail:"; tail -3 "/tmp/r3_$name.log"
}

# 1. Hardware grad parity at the 4-factor sizes (the bf16-spectra backward
#    change is unreachable on CPU: interpret mode takes the f32 XLA path).
run parity_huge 7200 env TPU_PARITY_SIZES=524288,1048576,2097152,4194304 \
  python -u benchmarks/tpu_parity.py

# 2. Re-time fwd+bwd at the 4-factor sizes (was fwd_bwd/fwd 4.7-6.0).
run retime_huge 7200 python -u benchmarks/benchmark_flashfftconv.py \
  --sizes 524288,1048576,2097152,4194304 \
  --csv benchmarks/results_v5e_r3_huge.csv

# 3. Small-N per-call overhead breakdown (scan-floor / kernel-only /
#    hoisted-spectrum / full).
run smalln_probe 3600 python -u benchmarks/tpu_smalln_probe.py

echo "=== session-2b queue done ($(date -u +%H:%M:%S)) ==="
