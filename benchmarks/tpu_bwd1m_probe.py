"""Where does the 1M plain backward spend its time?

The grid of record (results_v5e_r4_final.csv) has fwd_bwd/fwd = 4.46 for
the PLAIN conv at 1M — the only failing ratio bar — while gated reads 3.30.
The absolute numbers say the fused 3-factor backward costs ~22 ms at
(B=1, H=96) whether gated or not, i.e. it is NOT bandwidth-bound (the
gated variant moves ~2.3x the bytes): something in the kernel or its
epilogue dominates. This probe times the pieces on-chip:

  1. forward conv (the 2-transform reference point, MFU 0.365 in the grid)
  2. full plain fwd+bwd through the public VJP
  3. _long_bwd_tiles alone (the fused Pallas kernel, need_y=False)
  4. _finish_dk alone (the (H, fb, N1, N2) -> (H, k) inverse transform)
  5. _kernel_spectrum alone (k -> K_f, done once per backward)
  6. du-via-forward alternative: the forward kernel on dout with the
     conjugate spectrum (a correlation) — if (1)+(6)-style decomposition
     beats the fused kernel, the fused kernel is leaving MXU on the table.

Writes benchmarks/tpu_bwd1m_probe.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from flashfftconv_tpu import fft_conv
from flashfftconv_tpu.ops.plan import get_plan
from flashfftconv_tpu.ops import monarch_pallas as mp
from flashfftconv_tpu.utils.benchmarking import benchmark_forward

_SUFFIX = "_override" if os.environ.get("FLASHFFTCONV_BWD_FACTORS") else ""
OUT = os.path.join(os.path.dirname(__file__), f"tpu_bwd1m_probe{_SUFFIX}.json")

N = int(os.environ.get("BWD1M_N", 1048576))
B = int(os.environ.get("BWD1M_B", 1))
H = int(os.environ.get("BWD1M_H", 96))


def main():
    plan = get_plan(N)
    print(f"plan factors: {plan.factors}", flush=True)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((B, H, N)).astype(np.float32) * 0.02
                    ).astype(jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((H, N)).astype(np.float32) * 0.02)
    dout = jnp.asarray(rng.standard_normal((B, H, N)).astype(np.float32) * 0.02
                       ).astype(jnp.bfloat16)
    res = {"factors": list(plan.factors), "B": B, "H": H, "N": N}

    # 1. forward
    res["fwd_ms"] = benchmark_forward(
        lambda u, k: fft_conv(plan, u, k), u, k, repeats=8)
    print(f"fwd: {res['fwd_ms']:.3f} ms", flush=True)

    # 2. full plain fwd+bwd via the public VJP
    g = jax.jit(jax.grad(
        lambda u, k: jnp.sum(fft_conv(plan, u, k).astype(jnp.float32) ** 2),
        argnums=(0, 1)))
    res["fwd_bwd_ms"] = benchmark_forward(g, u, k, repeats=6)
    print(f"fwd+bwd: {res['fwd_bwd_ms']:.3f} ms", flush=True)

    if len(plan.factors) == 3:
        io = mp._io_dtype(plan, u.dtype)
        f0, n1, n2 = plan.factors

        def shaped(v):
            return v.astype(io).reshape(B, H, f0, n1, n2)

        kf_re, kf_im = mp._kernel_spectrum(plan, k, half=True)
        kfc_re, kfc_im = mp._kf_cast(plan, kf_re, kf_im)
        kfc_re, kfc_im = jax.device_put(kfc_re), jax.device_put(kfc_im)

        # 3. the fused backward kernel alone (need_y=False, ungated)
        def bwd_kernel_only(u5, g5):
            du5, y5, dkr, dki = mp._long_bwd_tiles(
                u5, g5, kfc_re, kfc_im,
                mp._outer_tables_half(plan), mp._tables(plan, base=1),
                factors=plan.factors, compute_dtype=plan.compute_dtype_name,
                io_dtype=io, need_y=False)
            return du5, dkr, dki

        u5, g5 = shaped(u), shaped(dout)
        res["bwd_kernel_ms"] = benchmark_forward(
            bwd_kernel_only, u5, g5, repeats=6)
        print(f"_long_bwd_tiles: {res['bwd_kernel_ms']:.3f} ms", flush=True)

        # 4. _finish_dk alone (on a representative accumulated spectrum)
        du5, dkr, dki = jax.jit(bwd_kernel_only)(u5, g5)
        res["finish_dk_ms"] = benchmark_forward(
            lambda r, i: mp._finish_dk(plan, r, i, k, half=True),
            dkr, dki, repeats=8)
        print(f"_finish_dk: {res['finish_dk_ms']:.3f} ms", flush=True)

        # 5. kernel spectrum (half) alone
        res["kernel_spectrum_ms"] = benchmark_forward(
            lambda k: mp._kernel_spectrum(plan, k, half=True), k, repeats=8)
        print(f"_kernel_spectrum: {res['kernel_spectrum_ms']:.3f} ms",
              flush=True)

    # 6. du via the forward kernel with the time-reversed kernel
    #    (circular correlation: du = y-conv(dout, k_rev)); same cost as a
    #    forward — the floor for the du part of the backward.
    k_rev = jnp.roll(jnp.flip(k, axis=-1), 1, axis=-1)
    res["du_via_fwd_ms"] = benchmark_forward(
        lambda d, kr: fft_conv(plan, d, kr), dout, k_rev, repeats=8)
    print(f"du via forward: {res['du_via_fwd_ms']:.3f} ms", flush=True)

    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
