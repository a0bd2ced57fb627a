#!/bin/bash
# Round-4 session-6 TPU queue: the remainder of session-5 after the relay
# died at 12:55 (retime_final landed; bench refused cleanly). Relay-aware:
# probes the chip before every item and sleeps out outages instead of
# burning each item's timeout on a dead link. ONE TPU process at a time;
# logs in .r4logs/.
set -u
cd "$(dirname "$0")/.."
mkdir -p .r4logs

probe() {  # 0 when the chip answers a tiny matmul readback within 120 s
  timeout 120 python - <<'EOF' >/dev/null 2>&1
import numpy as np, jax, jax.numpy as jnp
x = jnp.ones((128, 128))
np.asarray(jax.device_get((x @ x).ravel()[0]))
EOF
}

wait_for_relay() {
  until probe; do
    echo "relay down, sleeping 300s ($(date -u +%H:%M:%S))"
    sleep 300
  done
}

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  wait_for_relay
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  timeout "$tmo" "$@" > ".r4logs/$name.log" 2>&1
  echo "--- rc=$? tail:"; tail -3 ".r4logs/$name.log"
}

# 1. Headline with the new defaults.
run bench 3600 python -u bench.py

# 2. conv1d A/B: XLA-transposed backward vs fused Pallas backward.
run conv1d_bwdconvs 3600 env FLASHFFTCONV_DW_BWD_CONVS=1 \
  python -u benchmarks/benchmark_conv1d.py \
  --csv benchmarks/results_conv1d_v5e_bwdconvs.csv
run conv1d_default 3600 python -u benchmarks/benchmark_conv1d.py \
  --csv benchmarks/results_conv1d_v5e_r4.csv

# 3. Small-N overhead probe (VERDICT r3 item 5).
run smalln_probe 3600 python -u benchmarks/tpu_smalln_probe.py

# 4. Fixed VMEM probe (committed json predates the expected-value fix).
run vmem_probe 1800 python -u benchmarks/tpu_vmem_probe.py

# 5. Quality/scale artifacts (VERDICT r3 item 4).
run hyena125m_train 3600 python -u examples/lm/train.py \
  --preset hyena-125M --batch_size 2 --steps 20 --time-steps --warmup 5 \
  --log-file benchmarks/hyena125m_v5e.jsonl
run hdna_1m_train 7200 python -u examples/hyena_dna/train.py \
  --model large-1m --d_model 128 --steps 6 --remat --time-steps \
  --log-file benchmarks/hyenadna_v5e.jsonl
run listops 10800 python -u examples/lra/train_listops.py --epochs 20 \
  --log-file benchmarks/listops_v5e.jsonl
run seqcls_seed1 3600 python -u examples/seqcls/train.py --epochs 10 --seed 1 \
  --log-file benchmarks/seqcls_v5e_seed1.jsonl
run hdna_2m_fwd 7200 python -u examples/hyena_dna/train.py \
  --d_model 128 --n_layer 8 --l_max 2097152 --benchmark \
  --log-file benchmarks/hyenadna_v5e.jsonl

echo "=== round-4 session-6 queue done ($(date -u +%H:%M:%S)) ==="
