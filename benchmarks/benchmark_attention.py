"""Attention benchmark sweep: Pallas flash kernel vs the XLA O(L^2) path,
fwd and fwd+bwd, plus the sliding-window splash kernel's O(L*W) scaling —
the analog of the reference's flash-attention benchmarks
(examples/hyena/flash-attention/benchmarks/benchmark_flash_attention.py:
same B*H*L normalization idea, fwd/bwd timing via its benchmark_all).

Writes benchmarks/results_attention_v5e.csv. Run exclusively on the chip
(never share it with another TPU process — timings inflate).
"""

from __future__ import annotations

import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(os.path.dirname(__file__), "results_attention_v5e.csv")


def main():
    import jax
    import jax.numpy as jnp

    from flashfftconv_tpu.ops.attention import flash_mha
    from flashfftconv_tpu.utils.benchmarking import (
        benchmark_backward,
        benchmark_forward,
        benchmark_memory,
    )

    rng = np.random.default_rng(0)
    rows = []
    h, d = 8, 128  # 1024 hidden; B chosen per L to keep B*L tokens constant
    tok_budget = 64 * 2048

    def mk(b, l):
        def one():
            return jnp.asarray(
                rng.standard_normal((b, h, l, d)).astype(np.float32)
            ).astype(jnp.bfloat16)

        return one(), one(), one()

    for l in (512, 1024, 2048, 4096, 8192, 16384, 32768):
        b = max(1, tok_budget // l)
        q, k, v = mk(b, l)
        for impl in ("flash", "xla"):
            if impl == "xla" and l > 8192:
                continue  # O(L^2) memory blows up; the comparison point is moot
            fn = lambda q, k, v: flash_mha(q, k, v, causal=True, impl=impl)
            try:
                fwd_ms = benchmark_forward(fn, q, k, v)
                bwd_ms = benchmark_backward(fn, q, k, v, argnums=(0, 1, 2))
                mem_mb = benchmark_memory(fn, q, k, v)
                row = dict(case="causal", impl=impl, B=b, L=l,
                           fwd_ms=round(fwd_ms, 3), fwd_bwd_ms=round(bwd_ms, 3),
                           mem_mb=round(mem_mb, 1))
            except Exception as e:  # noqa: BLE001
                row = dict(case="causal", impl=impl, B=b, L=l,
                           fwd_ms=-1, fwd_bwd_ms=-1, mem_mb=-1,
                           error=repr(e)[:120])
            rows.append(row)
            print(row, flush=True)

        # sliding window: cost should grow ~linearly in L at fixed W
        if l >= 4096:
            w = 1024
            fn = lambda q, k, v: flash_mha(q, k, v, causal=True, impl="flash",
                                           window=w)
            try:
                fwd_ms = benchmark_forward(fn, q, k, v)
                row = dict(case=f"window{w}", impl="splash", B=b, L=l,
                           fwd_ms=round(fwd_ms, 3), fwd_bwd_ms=-1, mem_mb=-1)
            except Exception as e:  # noqa: BLE001
                row = dict(case=f"window{w}", impl="splash", B=b, L=l,
                           fwd_ms=-1, fwd_bwd_ms=-1, mem_mb=-1,
                           error=repr(e)[:120])
            rows.append(row)
            print(row, flush=True)

    keys = ["case", "impl", "B", "L", "fwd_ms", "fwd_bwd_ms", "mem_mb", "error"]
    with open(OUT, "w", newline="") as f:
        wtr = csv.DictWriter(f, fieldnames=keys)
        wtr.writeheader()
        for r in rows:
            wtr.writerow({k: r.get(k, "") for k in keys})
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
