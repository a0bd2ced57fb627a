#!/bin/bash
# Round-4 session-4 TPU queue (supersedes run_round4_session3.sh).
# State when written: session-1 artifacts landed (512K-4M parity re-verify,
# r4_huge retime); factor sweep landed 64K-1M + is being extended to the
# 2-factor single-kernel candidates (64K-256K), fat 4-factor pipelines (4M)
# and the 2M rows. Items below run AFTER that sweep completes and the
# measured winners are flipped into plan.default_factors/_LONG*_CANDIDATES.
# ONE TPU process at a time. Logs land in .r4logs/ (NOT /tmp — survives).
set -u
cd "$(dirname "$0")/.."
mkdir -p .r4logs

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  timeout "$tmo" "$@" > ".r4logs/$name.log" 2>&1
  echo "--- rc=$? tail:"; tail -3 ".r4logs/$name.log"
}

# 0. Any factor-sweep rows that died on transient relay errors retry on
#    resume (the sweep drops error rows from its done-set).
run factor_sweep_resume 14400 python -u benchmarks/tpu_factor_sweep.py

# 1. Fixed VMEM probe (committed json predates the expected-value fix).
run vmem_probe 1800 python -u benchmarks/tpu_vmem_probe.py

# 2. Hardware grad parity at every size whose DEFAULT factorization changed
#    (64K-2M after the flip), forced rerun.
run parity_newdefaults 10800 env TPU_PARITY_FORCE=1 \
  TPU_PARITY_SIZES=65536,131072,262144,524288,1048576,2097152 \
  python -u benchmarks/tpu_parity.py

# 3. Re-time the new defaults into the grid of record (64K-4M).
run retime_final 14400 python -u benchmarks/benchmark_flashfftconv.py \
  --sizes 65536,131072,262144,524288,1048576,2097152,4194304 \
  --csv benchmarks/results_v5e_r4_final.csv

# 4. conv1d A/B: XLA-transposed backward vs fused Pallas backward at the
#    (now default-raised) budget.
run conv1d_bwdconvs 3600 env FLASHFFTCONV_DW_BWD_CONVS=1 \
  python -u benchmarks/benchmark_conv1d.py \
  --csv benchmarks/results_conv1d_v5e_bwdconvs.csv
run conv1d_default 3600 python -u benchmarks/benchmark_conv1d.py \
  --csv benchmarks/results_conv1d_v5e_r4.csv

# 5. Small-N overhead probe (VERDICT r3 item 5).
run smalln_probe 3600 python -u benchmarks/tpu_smalln_probe.py

# 6. Headline with the new defaults.
run bench 3600 python -u bench.py

# 7. Quality/scale artifacts (VERDICT r3 item 4).
run seqcls_seed1 3600 python -u examples/seqcls/train.py --epochs 10 --seed 1 \
  --log-file benchmarks/seqcls_v5e_seed1.jsonl
run hyena125m_train 3600 python -u examples/lm/train.py \
  --preset hyena-125M --batch_size 2 --steps 20 --time-steps --warmup 5 \
  --log-file benchmarks/hyena125m_v5e.jsonl
run hdna_1m_train 7200 python -u examples/hyena_dna/train.py \
  --model large-1m --d_model 128 --steps 6 --remat --time-steps \
  --log-file benchmarks/hyenadna_v5e.jsonl
run listops 10800 python -u examples/lra/train_listops.py --epochs 20 \
  --log-file benchmarks/listops_v5e.jsonl
run hdna_2m_fwd 7200 python -u examples/hyena_dna/train.py \
  --d_model 128 --n_layer 8 --l_max 2097152 --benchmark \
  --log-file benchmarks/hyenadna_v5e.jsonl

echo "=== round-4 session-4 queue done ($(date -u +%H:%M:%S)) ==="
