#!/bin/bash
# Round-3 retry/validation queue — run AFTER run_round3_tpu.sh finishes.
# One TPU process at a time.
set -u
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  timeout "$tmo" "$@" > "/tmp/r3_$name.log" 2>&1
  echo "--- rc=$? tail:"; tail -3 "/tmp/r3_$name.log"
}

# 1. Fused 3-factor backward kernel: hardware grad parity at 64K-256K
#    (interpret-mode tests can't catch Mosaic lowering issues).
run bwd_check 3600 python -u benchmarks/tpu_bwd_check.py

# 2. Re-time the sizes the round-3 kernel changes touch: 256-2K (the
#    _h_tile block-size fix for the small-N dispatch floor) and 64K-256K
#    (the fused backward; was fwd_bwd/fwd 4.7-6.0 separate-transform).
run retime 5400 python -u benchmarks/benchmark_flashfftconv.py \
  --sizes 256,512,1024,2048,65536,131072,262144 \
  --csv benchmarks/results_v5e_r3_retime.csv

# 2b. conv1d backward A/B: the same grid with the XLA grouped-conv
#     backward (FLASHFFTCONV_DW_BWD_CONVS=1) to decide the default
#     data-driven (the fused bwd measured 0.83-0.91x of XLA AD).
run conv1d_bwdconvs 3600 env FLASHFFTCONV_DW_BWD_CONVS=1 \
  python -u benchmarks/benchmark_conv1d.py \
  --csv benchmarks/results_conv1d_v5e_bwdconvs.csv

# 3. HyenaDNA 1M training retry at d_model=128 (d=256 needs >16 GB even
#    with remat; VERDICT round-2 item 2 allows d_model 128-256).
run hdna_1m_train 5400 python -u examples/hyena_dna/train.py \
  --model large-1m --d_model 128 --steps 6 --remat --time-steps \
  --log-file benchmarks/hyenadna_v5e.jsonl

# 3b. Beyond the reference's 1M flagship: a 2M-token forward (N=4M conv,
#     the top of the supported ladder) at d_model=128.
run hdna_2m_fwd 5400 python -u examples/hyena_dna/train.py \
  --d_model 128 --n_layer 8 --l_max 2097152 --benchmark \
  --log-file benchmarks/hyenadna_v5e.jsonl

# 4. Hyena-125M retry at B=2 (B=4 peaked at 20.4 GB).
run hyena125m_train 3600 python -u examples/lm/train.py \
  --preset hyena-125M --batch_size 2 --steps 20 --time-steps --warmup 5 \
  --log-file benchmarks/hyena125m_v5e.jsonl

# 5. Second seed for the seqcls quality run (round-2 weak #5: single seed).
run seqcls_seed1 3600 python -u examples/seqcls/train.py --epochs 10 --seed 1 \
  --log-file benchmarks/seqcls_v5e_seed1.jsonl

echo "=== retry queue done ($(date -u +%H:%M:%S)) ==="
