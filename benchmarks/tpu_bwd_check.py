"""Hardware correctness check for the fused 3-factor backward kernel
(_long_bwd_fused): grads through the public custom_vjp path vs the f32
jnp.fft AD oracle at 64K/128K/256K, plain and gated, full and padded.
Mirrors the tolerance ladder of tests/test_fftconv.py (and the reference's
tests/test_flashfftconv.py:105-107). Writes one JSON line per case to
stdout and exits nonzero on any failure."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from flashfftconv_tpu import FlashFFTConv, fft_conv_reference

rng = np.random.default_rng(0)
failures = 0

for seqlen in (65536, 131072, 262144):
    for gated in (False, True):
        for padded in (False, True):
            b, h = 2, 32
            length = seqlen // 2 if padded else seqlen
            conv = FlashFFTConv(seqlen, dtype=jnp.bfloat16)
            u = jnp.asarray(
                rng.standard_normal((b, h, length)).astype(np.float32) * 0.02
            )
            k = jnp.asarray(
                (rng.standard_normal((h, length)) * 0.02
                 * np.exp(-0.1 * np.arange(length))).astype(np.float32)
            )
            args = [u, k]
            if gated:
                args += [
                    jnp.asarray(rng.standard_normal(u.shape).astype(np.float32)),
                    jnp.asarray(rng.standard_normal(u.shape).astype(np.float32)),
                ]
            dout = jnp.asarray(
                rng.standard_normal(u.shape).astype(np.float32) * 0.02
            )
            argnums = tuple(range(len(args)))

            def loss(*a):
                return jnp.sum(conv(a[0].astype(jnp.bfloat16), *a[1:]) * dout)

            def loss_ref(*a):
                return jnp.sum(fft_conv_reference(seqlen, *a) * dout)

            g = jax.jit(jax.grad(loss, argnums=argnums))(*args)
            g_ref = jax.grad(loss_ref, argnums=argnums)(*args)
            names = ["u", "k", "pre", "post"][: len(args)]
            errs = {}
            for n, a_, b_ in zip(names, g, g_ref):
                errs[f"d{n}_err"] = float(
                    np.abs(np.asarray(a_, np.float32) - np.asarray(b_, np.float32)).max()
                )
            # reference bars: u.grad 1e-2; k.grad 1e-1 (<512K)
            ok = errs["du_err"] < 1e-2 and errs["dk_err"] < 1e-1
            if gated:
                ok = ok and errs["dpre_err"] < 1e-1 and errs["dpost_err"] < 1e-1
            failures += 0 if ok else 1
            print(json.dumps({"seqlen": seqlen, "gated": gated,
                              "padded": padded, "ok": ok, **errs}), flush=True)

print(json.dumps({"failures": failures}), flush=True)
sys.exit(1 if failures else 0)
