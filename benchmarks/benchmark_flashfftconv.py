"""FlashFFTConv-TPU benchmark grid, mirroring the reference methodology
(/root/reference/benchmarks/benchmark_flashfftconv.py:70-93): functions
{conv, gated, padded, gated padded} x {forward, backward, memory} over
seqlens 256..4M, results normalized to the B=64*H=768 workload via
``adjustment = total_seqs / (B_local * H_local)`` with B/H capped per size,
written as CSV.

Usage: python benchmarks/benchmark_flashfftconv.py [--sizes 1024,32768]
       [--impl auto|xla|fft] [--fwd-only] [--csv out.csv]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from flashfftconv_tpu import FlashFFTConv, fft_conv_reference
from flashfftconv_tpu.ops.plan import default_factors
from flashfftconv_tpu.utils.benchmarking import (
    benchmark_backward,
    benchmark_forward,
    benchmark_forward_amortized,
    benchmark_memory,
    conv_throughput,
)

# Below this size the per-jit-call dispatch cost (fixed ~ms through the axon
# relay) rivals the kernel itself; also record the scan-amortized per-call
# time, which is the number a training step actually pays (many convs per jit).
AMORTIZE_BELOW = 65536

ALL_SIZES = [256, 512, 1024, 2048, 4096, 8192, 16384, 32768,
             65536, 131072, 262144, 524288, 1048576, 2097152, 4194304]

B_REF, H_REF = 64, 768  # normalization workload (reference line 70)


def set_b_h(seqlen: int) -> tuple[int, int]:
    """Per-size B/H caps, scaled for 16 GB v5e (the reference's table at
    benchmark_flashfftconv.py:28-59 targets 80 GB H100s)."""
    if seqlen <= 4096:
        return 32, 768
    if seqlen <= 32768:
        return 8, 768
    if seqlen <= 131072:
        return 2, 384
    if seqlen <= 524288:
        return 1, 192
    if seqlen <= 1048576:
        return 1, 96
    return 1, 32


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default=",".join(map(str, ALL_SIZES)))
    p.add_argument("--impl", default="auto")
    p.add_argument("--fwd-only", action="store_true")
    p.add_argument("--no-ref", action="store_true", help="skip jnp.fft baseline")
    p.add_argument("--csv", default="")
    p.add_argument("--repeats", type=int, default=10)
    p.add_argument("--repeats-huge", type=int, default=3,
                   help="repeats for seqlen >= 1M (a 4M bwd call is ~100 ms-"
                        "scale; the auto-scaling timer would otherwise spend "
                        "minutes per cell)")
    args = p.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    rng = np.random.default_rng(0)

    rows = []
    for n in sizes:
        repeats = args.repeats if n < 1048576 else args.repeats_huge
        b, h = set_b_h(n)
        adjustment = (B_REF * H_REF) / (b * h)
        conv = FlashFFTConv(n, dtype=jnp.bfloat16, impl=args.impl)

        for padded in (False, True):
            length = n // 2 if padded else n
            u = jnp.asarray(
                rng.standard_normal((b, h, length)).astype(np.float32) * 0.02
            ).astype(jnp.bfloat16)
            k = jnp.asarray(
                (rng.standard_normal((h, length)) * 0.02
                 * np.exp(-0.1 * np.arange(length))).astype(np.float32)
            )
            for gated in (False, True):
                name = ("gated " if gated else "") + ("padded conv" if padded else "conv")
                # gates are passed as ARGUMENTS, never closed over: a jit
                # closure would embed them as MLIR constants (hundreds of MB
                # at large B*H*L)
                if gated:
                    pre = jnp.asarray(
                        rng.standard_normal(u.shape).astype(np.float32) * 0.02
                    ).astype(jnp.bfloat16)
                    post = jnp.asarray(
                        rng.standard_normal(u.shape).astype(np.float32) * 0.02
                    ).astype(jnp.bfloat16)
                    fwd = lambda u, k, pre, post: conv(u, k, pre, post)
                    fargs = (u, k, pre, post)
                    argnums = (0, 1, 2, 3)
                else:
                    fwd = lambda u, k: conv(u, k)
                    fargs = (u, k)
                    argnums = (0, 1)

                row = {"seqlen": n, "func": name, "B": b, "H": h}
                row["fwd_ms"] = benchmark_forward(fwd, *fargs, repeats=repeats) * adjustment
                # GFLOP/s + MFU from the UNADJUSTED time and the local (b, h)
                # workload (the adjustment is a linear rescale, so throughput
                # is the same either way; computing it locally avoids
                # pretending B_REF fits on the chip).
                thru = conv_throughput(
                    n, default_factors(n), b, h,
                    row["fwd_ms"] / adjustment, gated=gated,
                )
                row.update(thru)
                if n < AMORTIZE_BELOW:
                    row["fwd_amort_ms"] = (
                        benchmark_forward_amortized(fwd, *fargs, repeats=repeats)
                        * adjustment
                    )
                    amort = conv_throughput(
                        n, default_factors(n), b, h,
                        row["fwd_amort_ms"] / adjustment, gated=gated,
                    )
                    row["gflops_algo_amort"] = amort["gflops_algo"]
                    row["mfu_amort"] = amort["mfu"]
                if not args.fwd_only:
                    row["fwd_bwd_ms"] = (
                        benchmark_backward(fwd, *fargs, argnums=argnums, repeats=repeats)
                        * adjustment
                    )
                    row["mem_mb"] = benchmark_memory(fwd, *fargs)
                if not args.no_ref:
                    ref = (
                        (lambda u, k, pre, post: fft_conv_reference(n, u, k, pre, post))
                        if gated
                        else (lambda u, k: fft_conv_reference(n, u, k))
                    )
                    row["ref_fwd_ms"] = (
                        benchmark_forward(ref, *fargs, repeats=repeats) * adjustment
                    )
                    row["speedup"] = row["ref_fwd_ms"] / row["fwd_ms"]
                    if n < AMORTIZE_BELOW:
                        row["ref_fwd_amort_ms"] = (
                            benchmark_forward_amortized(ref, *fargs, repeats=repeats)
                            * adjustment
                        )
                        row["speedup_amort"] = (
                            row["ref_fwd_amort_ms"] / row["fwd_amort_ms"]
                        )
                    if not args.fwd_only:
                        row["ref_mem_mb"] = benchmark_memory(ref, *fargs)
                rows.append(row)
                print(
                    "  ".join(
                        f"{k}={v:.3f}" if isinstance(v, float) else f"{k}={v}"
                        for k, v in row.items()
                    ),
                    flush=True,
                )
                if args.csv:
                    _write_csv(args.csv, rows)  # incremental: a crash at 4M
                    # must not lose hours of completed rows

    if args.csv:
        _write_csv(args.csv, rows)
        print(f"wrote {args.csv}")


def _write_csv(path, rows):
    import csv

    keys = sorted({k for r in rows for k in r})
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        w.writerows(rows)


if __name__ == "__main__":
    main()
