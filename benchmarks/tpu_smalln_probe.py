"""Small-N per-call overhead breakdown (TPU): where do the ~0.6 ms/call go?

At N=256 the fused kernel's device work is ~35 us, yet the scan-amortized
per-call time in bench.py is ~0.62 ms. This probe times four nested variants
inside the same 16-deep serially-dependent lax.scan (one jit call, per-call
time reported), so the difference between adjacent variants isolates one
layer of the stack:

  scan_floor   carry * 1.0001 only                  -> scan/dispatch floor
  kernel_only  _conv_fused_io_tiles with precomputed
               spectrum + tables                     -> raw kernel cost
  hoisted      _conv_raw with the kernel spectrum
               computed OUTSIDE the loop             -> + dispatch/layout glue
  full         public conv(u, k, pre, post)          -> + per-call
               _kernel_spectrum (tests whether XLA
               hoists the loop-invariant spectrum)

One JSON line per (N, variant) with per-call ms.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bench import timeit, device_reachable, log
import flashfftconv_tpu as ff
from flashfftconv_tpu.ops import monarch_pallas as mp
from flashfftconv_tpu.ops.plan import get_plan

SCAN_LEN = 16


def scanned(body):
    def fn(u0, *rest):
        def step(c, _):
            out = body(c, *rest)
            return out.astype(u0.dtype).reshape(u0.shape), None

        c, _ = jax.lax.scan(step, u0, None, length=SCAN_LEN)
        return c

    return jax.jit(fn)


def main():
    if not device_reachable():
        log("tpu_smalln_probe: device unreachable")
        # os._exit: the axon client's C++ teardown SIGABRTs over sys.exit
        # when the relay is down (same fix as bench.py, BENCH_r03 rc=134)
        sys.stderr.flush()
        os._exit(3)

    rng = np.random.default_rng(0)
    for n in (256, 512, 1024, 2048):
        b, h = 16, 768
        u = jnp.asarray(
            rng.standard_normal((b, h, n)).astype(np.float32) * 0.02
        ).astype(jnp.bfloat16)
        k = jnp.asarray(
            (rng.standard_normal((h, n)) * 0.02 * np.exp(-0.1 * np.arange(n))
             ).astype(np.float32)
        )
        pre = jnp.asarray(
            rng.standard_normal(u.shape).astype(np.float32) * 0.02
        ).astype(jnp.bfloat16)
        post = jnp.asarray(
            rng.standard_normal(u.shape).astype(np.float32) * 0.02
        ).astype(jnp.bfloat16)

        plan = get_plan(n)
        kf_re, kf_im = mp._kernel_spectrum(plan, k)
        kfc_re, kfc_im = mp._kf_cast(plan, kf_re, kf_im)
        tables = mp._tables(plan)
        ht = mp._h_tile(*plan.factors, h)
        io = mp._io_dtype(plan, u.dtype)
        conv = ff.FlashFFTConv(n, dtype=jnp.bfloat16)

        variants = {
            "scan_floor": (lambda c: c * 1.0001, ()),
            "kernel_only": (
                lambda c, pre, post: mp._conv_fused_io_tiles(
                    c.astype(io), kfc_re, kfc_im, pre.astype(io),
                    post.astype(io), tables, plan_factors=plan.factors,
                    seqlen=plan.seqlen, compute_dtype=plan.compute_dtype_name,
                    gated=True, ht=ht,
                ),
                (pre, post),
            ),
            "hoisted": (
                lambda c, pre, post: mp._conv_raw(
                    plan, c, kf_re, kf_im, pre, post, c.dtype
                ),
                (pre, post),
            ),
            "full": (
                lambda c, k, pre, post: conv(c, k, pre, post),
                (k, pre, post),
            ),
        }
        if n <= 1024:
            # A/B: the direct-DFT kernel (1-factor plan) vs the 2-factor
            # Monarch above. The small-N Monarch kernel is VPU-pass-bound
            # at 1.8-3.7x the bandwidth floor; the direct kernel has 2x
            # FLOPs but they are MXU-shaped (rows, N) @ (N, N) matmuls.
            from flashfftconv_tpu.ops.plan import make_plan
            from flashfftconv_tpu.ops.dispatch import fft_conv

            dplan = make_plan(n, factors=(n,))
            variants["direct_full"] = (
                lambda c, k, pre, post, dplan=dplan: fft_conv(
                    dplan, c, k, pre, post
                ),
                (k, pre, post),
            )
        for name, (body, rest) in variants.items():
            t = timeit(scanned(body), u, *rest) / SCAN_LEN
            print(json.dumps({"n": n, "variant": name,
                              "percall_ms": round(t * 1e3, 4)}), flush=True)


if __name__ == "__main__":
    main()
