#!/bin/bash
# Round-3 session-2 TPU queue (fresh VM; /tmp logs from session 1 are gone).
# Judge-priority order. ONE TPU process at a time.
set -u
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  timeout "$tmo" "$@" > "/tmp/r3_$name.log" 2>&1
  echo "--- rc=$? tail:"; tail -3 "/tmp/r3_$name.log"
}

# 1. Hardware grad parity for the fused 3-factor backward (64K-256K):
#    the kernel landed in commit 16bc878 with interpret-mode tests only.
run bwd_check 3600 python -u benchmarks/tpu_bwd_check.py

# 2. Re-time the sizes the round-3 kernels touch: 256-2K (_h_tile fix)
#    and 64K-256K (fused backward; was fwd_bwd/fwd 4.7-6.0).
run retime 5400 python -u benchmarks/benchmark_flashfftconv.py \
  --sizes 256,512,1024,2048,65536,131072,262144 \
  --csv benchmarks/results_v5e_r3_retime.csv

# 3. conv1d backward A/B: XLA grouped-conv backward vs fused Pallas bwd.
run conv1d_bwdconvs 3600 env FLASHFFTCONV_DW_BWD_CONVS=1 \
  python -u benchmarks/benchmark_conv1d.py \
  --csv benchmarks/results_conv1d_v5e_bwdconvs.csv

# 4. HyenaDNA 1M TRAINING at d_model=128 (d=256 needs >16 GB even with
#    remat; VERDICT round-2 item 2 allows d_model 128-256).
run hdna_1m_train 5400 python -u examples/hyena_dna/train.py \
  --model large-1m --d_model 128 --steps 6 --remat --time-steps \
  --log-file benchmarks/hyenadna_v5e.jsonl

# 5. Hyena-125M LM retry at B=2 (B=4 peaked at 20.4 GB).
run hyena125m_train 3600 python -u examples/lm/train.py \
  --preset hyena-125M --batch_size 2 --steps 20 --time-steps --warmup 5 \
  --log-file benchmarks/hyena125m_v5e.jsonl

# 6. LRA ListOps quality run (VERDICT item 6; S4-class ~59.6%,
#    Transformer 36.4%, random 10%).
run listops 7200 python -u examples/lra/train_listops.py --epochs 20 \
  --log-file benchmarks/listops_v5e.jsonl

# 7. Second seed for the seqcls quality run (round-2 weak #5).
run seqcls_seed1 3600 python -u examples/seqcls/train.py --epochs 10 --seed 1 \
  --log-file benchmarks/seqcls_v5e_seed1.jsonl

# 8. Beyond the reference's 1M flagship: 2M-token forward (N=4M conv).
run hdna_2m_fwd 5400 python -u examples/hyena_dna/train.py \
  --d_model 128 --n_layer 8 --l_max 2097152 --benchmark \
  --log-file benchmarks/hyenadna_v5e.jsonl

echo "=== session-2 queue done ($(date -u +%H:%M:%S)) ==="
