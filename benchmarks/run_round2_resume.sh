#!/bin/bash
# Round-2 resume queue (post-outage): the relay is back, so run the pending
# TPU workloads in judge-priority order. One TPU process at a time.
# Usage: bash benchmarks/run_round2_resume.sh
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/r2resume.pid

run() { # name timeout cmd...
  local name=$1 t=$2; shift 2
  echo "=== $name start $(date) ==="
  timeout "$t" "$@" > "/tmp/r2b_${name}.log" 2>&1
  echo "$name rc=$? ($(date))"
}

run seqcls   5400 python examples/seqcls/train.py --epochs 10 \
  --log-file benchmarks/seqcls_v5e.jsonl
run grid     7200 python benchmarks/benchmark_flashfftconv.py \
  --csv benchmarks/results_v5e.csv
BENCH_TIMEOUT=2400 run bench 3000 python bench.py
run attn     2400 python benchmarks/tpu_attention.py
run attnbench 3600 python benchmarks/benchmark_attention.py
run conv1d   3600 python benchmarks/benchmark_conv1d.py
run listops  5400 python examples/lra/train_listops.py --epochs 20 \
  --log-file benchmarks/listops_v5e.jsonl
run pathfinder 5400 python examples/lra/train_pathfinder.py --epochs 15 \
  --log-file benchmarks/pathfinder_v5e.jsonl
run retrieval 3600 python examples/lra/train_retrieval.py --epochs 8 \
  --log-file benchmarks/retrieval_v5e.jsonl
run ett      3600 python examples/forecasting/train_ett.py --epochs 10 \
  --log-file benchmarks/ett_v5e.jsonl
echo "RESUME QUEUE DONE $(date)"
