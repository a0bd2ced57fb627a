#!/bin/bash
# Round-3 TPU job queue — run AFTER the hyenadna-1M fwd benchmark finishes.
# One TPU process at a time (the chip is shared through the relay; concurrent
# timing runs inflate 3-7x). Each step is bounded and logs to /tmp.
set -u
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  timeout "$tmo" "$@" > "/tmp/r3_$name.log" 2>&1
  echo "--- rc=$? tail:"; tail -3 "/tmp/r3_$name.log"
}

# 1. HyenaDNA large-1m (8 layers, d=256, L=1M): a few real train steps with
#    gradient checkpointing — proves training at the reference's flagship
#    scale fits the 16 GB v5e (ref: benchmark_flash_dna_fwd.py:15-18).
run hdna_1m_train 3600 python -u examples/hyena_dna/train.py \
  --model large-1m --steps 6 --remat --time-steps \
  --log-file benchmarks/hyenadna_v5e.jsonl

# 2. M2-BERT base-110M (12x768, MLM, L=128, B=128 — the reference's
#    m2-110M-flashfftconv.yaml): fwd benchmark + 30 train steps.
run bert110m_fwd 2400 python -u examples/bert/train.py \
  --preset base-110M --benchmark --log-file benchmarks/m2bert110m_v5e.jsonl
run bert110m_train 3600 python -u examples/bert/train.py \
  --preset base-110M --steps 30 --time-steps \
  --log-file benchmarks/m2bert110m_v5e.jsonl

# 2b. Hyena-125M LM (12x768, L=8K, B=4, GPT-2 vocab — the reference's
#     125M-class ConvLMHeadModel, long_conv_lm.py:146-301): 20 train steps.
run hyena125m_train 3600 python -u examples/lm/train.py \
  --preset hyena-125M --steps 20 --time-steps --warmup 5 \
  --log-file benchmarks/hyena125m_v5e.jsonl

# 3. conv1d grid with the fused Pallas backward default (replaces the
#    pre-default-switch CSV; ref README.md:242-259 grid).
run conv1d_grid 3600 python -u benchmarks/benchmark_conv1d.py

# 4. LRA ListOps quality run (ref-harness task; S4-class ~59.6%,
#    Transformer 36.4%, random 10%).
run listops 7200 python -u examples/lra/train_listops.py --epochs 20 \
  --log-file benchmarks/listops_v5e.jsonl

echo "=== queue done ($(date -u +%H:%M:%S)) ==="
