"""Short depthwise conv1d benchmark, mirroring the reference grid
(/root/reference/benchmarks/benchmark_conv1d.py and README.md:242-259:
BLH, K=5, B=16, L in {1K..8K}, D in {768..8192}) against the XLA
lax.conv_general_dilated baseline (the torch nn.Conv1d analog).

Usage: python benchmarks/benchmark_conv1d.py [--k 5] [--bhl]
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
from flashfftconv_tpu.utils.benchmarking import benchmark_backward, benchmark_forward


def lax_ref_blh(x, w_kd, bias, padding):
    d = x.shape[-1]
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        w_kd.T[:, None, :].astype(jnp.float32),
        window_strides=(1,),
        padding=[(padding, padding)],
        feature_group_count=d,
        dimension_numbers=("NHC", "OIH", "NHC"),
    )
    return (out + bias.astype(jnp.float32)).astype(x.dtype)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--b", type=int, default=16)
    p.add_argument("--ls", default="1024,2048,4096,8192")
    p.add_argument("--ds", default="768,1024,2048,8192")
    p.add_argument("--repeats", type=int, default=10)
    args = p.parse_args()
    rng = np.random.default_rng(0)
    pad = (args.k - 1) // 2

    for l in map(int, args.ls.split(",")):
        for d in map(int, args.ds.split(",")):
            x = jnp.asarray(
                rng.standard_normal((args.b, l, d)).astype(np.float32)
            ).astype(jnp.bfloat16)
            w = jnp.asarray(rng.standard_normal((args.k, d)).astype(np.float32))
            bias = jnp.asarray(rng.standard_normal((d,)).astype(np.float32))
            t_mine = benchmark_forward(
                lambda x: depthwise_conv1d(x, w, bias, padding=pad, is_bhl=False),
                x, repeats=args.repeats,
            )
            t_ref = benchmark_forward(
                lambda x: lax_ref_blh(x, w, bias, pad), x, repeats=args.repeats
            )
            print(
                f"L={l} D={d}: flash {t_mine:.3f} ms | lax.conv {t_ref:.3f} ms "
                f"| {t_ref / t_mine:.2f}x",
                flush=True,
            )


if __name__ == "__main__":
    main()
