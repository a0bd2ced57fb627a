"""Numerical parity sweep on the REAL TPU chip (compiled Mosaic kernels, not
interpret mode): every seqlen 256..4M x {plain, padded, gated, gated_padded},
forward max-err vs the f32 jnp.fft oracle, plus full gradient parity (u/k/gate
grads) on two covering variants per size.

This is the hardware analog of tests/test_fftconv.py (same data distribution
and tolerance ladder as /root/reference/tests/test_flashfftconv.py:81-107:
out & u.grad atol 1e-2; k.grad 1e-1 (<512K) / 1 (<4M) / 2 (4M)), but routed
through the default dispatch (Pallas kernels on TPU). Results are appended
incrementally to benchmarks/tpu_parity.json so partial sweeps survive.

Run:  python benchmarks/tpu_parity.py            # full sweep
      TPU_PARITY_SIZES=256,32768 python ...      # subset
      TPU_PARITY_FORCE=1 python ...              # re-run + replace existing
                                                 # records for the swept sizes
                                                 # (use after a kernel change)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ALL_SIZES = [
    256, 512, 1024, 2048, 4096, 8192, 16384, 32768,
    65536, 131072, 262144, 524288, 1048576, 2097152, 4194304,
]
VARIANTS = ["plain", "padded", "gated", "gated_padded"]
# Gradient parity on the two ends of the feature matrix: ungated/unpadded and
# gated+padded (which exercises pregate/postgate grads and the L<N masking).
GRAD_VARIANTS = ("plain", "gated_padded")
# 2-D (H, L) "rows" inputs at >=64K take _long_bwd_spectrum_reuse on TPU
# (3-D inputs dispatch to the fused 3-/4-factor backwards), so they need
# their own hardware grad coverage (ADVICE r3 item 4).
ROWS_GRAD_MIN_SEQLEN = 65536

OUT_PATH = os.path.join(os.path.dirname(__file__), "tpu_parity.json")


def set_b_h(seqlen: int) -> tuple[int, int]:
    if seqlen <= 32768:
        return 2, 128
    if seqlen <= 262144:
        # even B so the big 2-factor defaults take the fused-I/O (packed)
        # path here, same as training shapes; B=1 odd-batch coverage at
        # these sizes comes from the rows-grad cases below.
        return 2, 16
    return 1, 8


def ktol(seqlen: int) -> float:
    return 1e-1 if seqlen < 524288 else 1.0 if seqlen < 4194304 else 2.0


def max_err(a, b) -> float:
    return float(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max())


def run_case(ff, jax, jnp, rng, seqlen, variant, check_grads):
    b, h = set_b_h(seqlen)
    padded = "padded" in variant
    gated = "gated" in variant
    length = seqlen // 2 if padded else seqlen
    dtype = jnp.bfloat16

    if variant == "rows":  # 2-D (H, L) input: the spectrum-reuse backward
        u_shape = (h, length)
    else:
        u_shape = (b, h, length)
    u = jnp.asarray((rng.standard_normal(u_shape) * 0.02).astype(np.float32)).astype(dtype)
    k = jnp.asarray(
        (rng.standard_normal((h, length)) * 0.02 * np.exp(-0.1 * np.arange(length))).astype(np.float32)
    )
    data = [u, k]
    if gated:
        pre = jnp.asarray((rng.standard_normal((b, h, length)) * 0.02).astype(np.float32)).astype(dtype)
        post = jnp.asarray((rng.standard_normal((b, h, length)) * 0.02).astype(np.float32)).astype(dtype)
        data += [pre, post]

    plan = ff.make_plan(seqlen, compute_dtype=dtype)
    impl = ff.resolve_impl(plan, "auto")

    fwd = jax.jit(lambda *a: ff.fft_conv(plan, *a))
    y = fwd(*data)
    y.block_until_ready()
    y_ref = ff.fft_conv_reference(seqlen, *data)
    rec = {
        "seqlen": seqlen,
        "variant": variant,
        "B": b,
        "H": h,
        "impl": impl,
        "out_err": max_err(y, y_ref),
        "out_tol": 1e-2,
    }
    rec["ok"] = rec["out_err"] < rec["out_tol"]

    if check_grads:
        dout = jnp.asarray((rng.standard_normal(y.shape) * 0.02).astype(np.float32)).astype(dtype)

        def loss_of(f):
            return lambda *a: jnp.sum(f(*a).astype(jnp.float32) * dout.astype(jnp.float32))

        argnums = tuple(range(len(data)))
        grads = jax.jit(jax.grad(loss_of(lambda *a: ff.fft_conv(plan, *a)), argnums=argnums))(*data)
        jax.block_until_ready(grads)
        grads_ref = jax.grad(loss_of(lambda *a: ff.fft_conv_reference(seqlen, *a)), argnums=argnums)(*data)
        names = ["u", "k", "pregate", "postgate"][: len(data)]
        for name, g, gr in zip(names, grads, grads_ref):
            tol = ktol(seqlen) if name == "k" else 1e-2
            err = max_err(g, gr)
            rec[f"{name}_grad_err"] = err
            rec[f"{name}_grad_tol"] = tol
            rec["ok"] = rec["ok"] and err < tol
    return rec


def main():
    import jax
    import jax.numpy as jnp

    import flashfftconv_tpu as ff
    from flashfftconv_tpu.ops.dispatch import resolve_impl

    ff.resolve_impl = resolve_impl

    sizes = [int(s) for s in os.environ.get("TPU_PARITY_SIZES", "").split(",") if s] or ALL_SIZES
    force = bool(int(os.environ.get("TPU_PARITY_FORCE", "0")))
    rng = np.random.default_rng(0)
    platform = jax.devices()[0].platform

    results = []
    if os.path.exists(OUT_PATH):
        try:
            results = json.load(open(OUT_PATH))["results"]
        except Exception:
            results = []
    if force:  # drop stale records for the sizes being re-swept
        results = [r for r in results if r["seqlen"] not in sizes]
    done = {(r["seqlen"], r["variant"]) for r in results}

    def flush():
        json.dump(
            {"platform": platform, "device": str(jax.devices()[0]), "results": results},
            open(OUT_PATH, "w"),
            indent=1,
        )

    for seqlen in sizes:
        variants = VARIANTS + (["rows"] if seqlen >= ROWS_GRAD_MIN_SEQLEN else [])
        for variant in variants:
            if (seqlen, variant) in done:
                continue
            t0 = time.time()
            try:
                rec = run_case(
                    ff, jax, jnp, rng, seqlen, variant,
                    check_grads=variant in GRAD_VARIANTS or variant == "rows",
                )
            except Exception as e:  # record the failure, keep sweeping
                rec = {"seqlen": seqlen, "variant": variant, "ok": False, "error": repr(e)[:500]}
            rec["wall_s"] = round(time.time() - t0, 1)
            results.append(rec)
            flush()
            print(json.dumps(rec), flush=True)

    n_bad = sum(1 for r in results if not r["ok"])
    print(f"DONE: {len(results)} cases, {n_bad} failures", flush=True)
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
