#!/bin/bash
# Round-4 session-1 TPU queue: VERDICT r3 item 1 — verification before new
# features. Drains the dead round-3 queue against the code at HEAD.
# ONE TPU process at a time. Logs to /tmp/r4_<name>.log.
set -u
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  timeout "$tmo" "$@" > "/tmp/r4_$name.log" 2>&1
  echo "--- rc=$? tail:"; tail -3 "/tmp/r4_$name.log"
}

# 1. Hardware grad parity for the now-default 4-factor fused backward
#    (_long4_bwd_fused) at 512K-4M; FORCE replaces the stale pre-rewrite
#    records. Also covers the new 2-D "rows" spectrum-reuse grad case.
run parity_huge 7200 env TPU_PARITY_FORCE=1 \
  TPU_PARITY_SIZES=524288,1048576,2097152,4194304 \
  python -u benchmarks/tpu_parity.py

# 2. The new 2-D rows grad case at the 3-factor sizes (only the "rows"
#    variant runs; existing records are kept).
run parity_rows 3600 env TPU_PARITY_SIZES=65536,131072,262144 \
  python -u benchmarks/tpu_parity.py

# 3. Re-time the 4-factor sizes with the fused backward (old ratios 3.2-3.7
#    were the pre-rewrite path).
run retime_huge 7200 python -u benchmarks/benchmark_flashfftconv.py \
  --sizes 524288,1048576,2097152,4194304 \
  --csv benchmarks/results_v5e_r4_huge.csv

# 4. Re-measure 32K (replaces the log-reconstructed rows, VERDICT weak #4)
#    and land the missing 131K/262K retime rows.
run retime_mid 5400 python -u benchmarks/benchmark_flashfftconv.py \
  --sizes 32768,65536,131072,262144 \
  --csv benchmarks/results_v5e_r4_mid.csv

# 5. conv1d backward A/B: XLA grouped-conv backward vs fused Pallas bwd
#    (VERDICT item 2 — decide the default from data).
run conv1d_bwdconvs 3600 env FLASHFFTCONV_DW_BWD_CONVS=1 \
  python -u benchmarks/benchmark_conv1d.py \
  --csv benchmarks/results_conv1d_v5e_bwdconvs.csv

# 6. Small-N per-call overhead breakdown (VERDICT item 5).
run smalln_probe 3600 python -u benchmarks/tpu_smalln_probe.py

# 7. A driver-capturable headline line (BENCH_r03 was rc=134).
run bench 3600 python -u bench.py

echo "=== round-4 session-1 queue done ($(date -u +%H:%M:%S)) ==="
