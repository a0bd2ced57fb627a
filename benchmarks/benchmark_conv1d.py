"""Short depthwise conv1d benchmark, mirroring the reference grid
(/root/reference/benchmarks/benchmark_conv1d.py and README.md:242-259:
BLH, K=5, B=16, L in {1K..8K}, D in {768..8192}) against the XLA
lax.conv_general_dilated baseline (the torch nn.Conv1d analog on TPU).

Reports fwd / fwd+bwd wall-clock, speedup, and achieved HBM bandwidth
(GB/s; read x + write y, bf16) so the distance to the chip's memory
speed-of-light is visible. Writes benchmarks/results_conv1d_v5e.csv.

Timing is scan-amortized (--amortize chained calls inside one jit, both
implementations measured identically — the per-call cost a training step
pays): the grid's sub-ms rows are pure relay-dispatch noise one-shot
(identical XLA programs read 0.78-1.28x run to run; results_conv1d_v5e*
cross-CSV comparison). --amortize 0 restores one-shot timing.

Usage: python benchmarks/benchmark_conv1d.py [--k 5] [--b 16] [--no-bwd]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from flashfftconv_tpu import depthwise_conv1d
from flashfftconv_tpu.utils.benchmarking import (
    benchmark_backward,
    benchmark_backward_amortized,
    benchmark_forward,
    benchmark_forward_amortized,
)

OUT_CSV = os.path.join(os.path.dirname(__file__), "results_conv1d_v5e.csv")


def lax_ref_blh(x, w_kd, bias, padding):
    """Baseline: the library's own XLA grouped-conv fallback (the torch
    nn.Conv1d analog on TPU), differentiable with matching dtypes."""
    from flashfftconv_tpu.ops.depthwise import _xla_depthwise

    return _xla_depthwise(x, w_kd, bias, padding, is_bhl=False, out_dtype=x.dtype)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--b", type=int, default=16)
    p.add_argument("--ls", default="1024,2048,4096,8192")
    p.add_argument("--ds", default="768,1024,2048,8192")
    p.add_argument("--repeats", type=int, default=20)
    p.add_argument("--amortize", type=int, default=8,
                   help="scan-chain length per jit call (0 = one-shot)")
    p.add_argument("--no-bwd", action="store_true")
    p.add_argument("--csv", default=OUT_CSV)
    args = p.parse_args()
    rng = np.random.default_rng(0)
    pad = (args.k - 1) // 2

    rows = ["B,L,D,K,flash_fwd_ms,lax_fwd_ms,fwd_speedup,flash_gbps,"
            "flash_fwdbwd_ms,lax_fwdbwd_ms,fwdbwd_speedup"]
    for l in map(int, args.ls.split(",")):
        for d in map(int, args.ds.split(",")):
            x = jnp.asarray(
                rng.standard_normal((args.b, l, d)).astype(np.float32)
            ).astype(jnp.bfloat16)
            w = jnp.asarray(rng.standard_normal((args.k, d)).astype(np.float32))
            bias = jnp.asarray(rng.standard_normal((d,)).astype(np.float32))

            flash = lambda x, w, bias: depthwise_conv1d(x, w, bias, padding=pad, is_bhl=False)
            ref = lambda x, w, bias: lax_ref_blh(x, w, bias, pad)
            if args.amortize:
                fwd = lambda f, *a: benchmark_forward_amortized(
                    f, *a, length=args.amortize, repeats=args.repeats)
            else:
                fwd = lambda f, *a: benchmark_forward(f, *a, repeats=args.repeats)
            t_mine = fwd(flash, x, w, bias)
            t_ref = fwd(ref, x, w, bias)
            # traffic: read x + write y, bf16 (weights/bias negligible)
            gb = 2 * args.b * l * d * 2 / 1e9
            gbps = gb / (t_mine * 1e-3)
            if args.no_bwd:
                tb_mine = tb_ref = float("nan")
            else:
                # Training-shaped backward: grads w.r.t. x, weights AND bias
                # (the reference's conv1d_backward emits all three).
                if args.amortize:
                    bwd = lambda f, *a: benchmark_backward_amortized(
                        f, *a, argnums=(0, 1, 2), length=args.amortize,
                        repeats=max(args.repeats // 2, 5))
                else:
                    bwd = lambda f, *a: benchmark_backward(
                        f, *a, argnums=(0, 1, 2),
                        repeats=max(args.repeats // 2, 5))
                tb_mine = bwd(flash, x, w, bias)
                tb_ref = bwd(ref, x, w, bias)
            rows.append(
                f"{args.b},{l},{d},{args.k},{t_mine:.4f},{t_ref:.4f},"
                f"{t_ref/t_mine:.2f},{gbps:.0f},{tb_mine:.4f},{tb_ref:.4f},"
                f"{tb_ref/tb_mine:.2f}"
            )
            print(rows[-1], flush=True)
    with open(args.csv, "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"wrote {args.csv}", flush=True)


if __name__ == "__main__":
    main()
