#!/bin/bash
# Round-4 session-2 TPU queue: run AFTER run_round4_session1.sh.
# 1-2: the VMEM probe + factor autotune that decide the new >=512K default
#      factorizations (fused 3-factor kernel vs 4-level pipeline).
# 3-7: the quality/scale artifacts queued since round 3 (VERDICT item 4).
# ONE TPU process at a time. Logs to /tmp/r4_<name>.log.
set -u
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  timeout "$tmo" "$@" > "/tmp/r4_$name.log" 2>&1
  echo "--- rc=$? tail:"; tail -3 "/tmp/r4_$name.log"
}

# 1. Per-kernel VMEM budget probe (scratch sizes 16-127 MB + bandwidth check).
run vmem_probe 1800 python -u benchmarks/tpu_vmem_probe.py

# 2. Hardware grad parity for the NEW gate-fused backwards: 2-factor
#    (2K/32K) and 3-factor (64K-256K) default gated backward changed.
run parity_gatefused 5400 env TPU_PARITY_FORCE=1 \
  TPU_PARITY_SIZES=2048,32768,65536,131072,262144 python -u benchmarks/tpu_parity.py

# 3. Factorization autotune 64K-4M: fused 3-factor candidates vs the
#    round-3 shapes, fwd + fwd+bwd, oracle-checked.
run factor_sweep 10800 python -u benchmarks/tpu_factor_sweep.py

# 3b. conv1d A/B re-run (session-1 run crashed on the since-reverted wide
#     D-tile and its partial rows measured that bad code): XLA-transpose
#     backward vs the fused Pallas backward, both at the default budget...
run conv1d_bwdconvs 3600 env FLASHFFTCONV_DW_BWD_CONVS=1 \
  python -u benchmarks/benchmark_conv1d.py \
  --csv benchmarks/results_conv1d_v5e_bwdconvs.csv

# 3c. ...and the improved fused backward under the raised budget
#     (_BWD_BIG: one-time f32 strips + forward-size L tiles).
run conv1d_bigbwd 3600 env FLASHFFTCONV_VMEM_MB=100 \
  python -u benchmarks/benchmark_conv1d.py \
  --csv benchmarks/results_conv1d_v5e_bigbwd.csv

# 3d. Small-N overhead probe (session-1 run hit a transient relay outage).
run smalln_probe 3600 python -u benchmarks/tpu_smalln_probe.py

# 3. LRA ListOps quality run (S4-class ~59.6%, Transformer 36.4%, random 10%).
run listops 7200 python -u examples/lra/train_listops.py --epochs 20 \
  --log-file benchmarks/listops_v5e.jsonl

# 4. Hyena-125M LM training throughput at B=2 (B=4 peaked at 20.4 GB).
run hyena125m_train 3600 python -u examples/lm/train.py \
  --preset hyena-125M --batch_size 2 --steps 20 --time-steps --warmup 5 \
  --log-file benchmarks/hyena125m_v5e.jsonl

# 5. HyenaDNA 1M TRAINING step at d_model=128 (with remat).
run hdna_1m_train 5400 python -u examples/hyena_dna/train.py \
  --model large-1m --d_model 128 --steps 6 --remat --time-steps \
  --log-file benchmarks/hyenadna_v5e.jsonl

# 6. Second seed for the seqcls quality run.
run seqcls_seed1 3600 python -u examples/seqcls/train.py --epochs 10 --seed 1 \
  --log-file benchmarks/seqcls_v5e_seed1.jsonl

# 7. Beyond the reference's 1M flagship: 2M-token forward (N=4M conv).
run hdna_2m_fwd 5400 python -u examples/hyena_dna/train.py \
  --d_model 128 --n_layer 8 --l_max 2097152 --benchmark \
  --log-file benchmarks/hyenadna_v5e.jsonl

echo "=== round-4 session-2 queue done ($(date -u +%H:%M:%S)) ==="
