"""On-chip factorization autotune for the fused long-conv kernels (64K-4M).

For each seqlen, times the gated forward and fwd+bwd at candidate Monarch
factorizations — the round-3 default (4-level butterfly pipeline at >=512K)
against single-pass fused 3-factor shapes with larger inner tiles, whose
VMEM footprints need the raised scoped-VMEM budget
(pltpu.CompilerParams(vmem_limit_bytes), see benchmarks/tpu_vmem_probe.py).
Each candidate's forward output is checked against the jnp.fft oracle
(atol 1e-2, the tests' bar) so a silently-wrong configuration can't win.

Results stream as JSON lines and land in benchmarks/tpu_factor_sweep.json;
winners feed plan._LONG3_CANDIDATES.

Env: FLASHFFTCONV_VMEM_MB (default set below BEFORE the library import),
     FACTOR_SWEEP_SIZES=comma,list to subset.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Must be set before the library import (plan.py reads it at module load).
os.environ.setdefault("FLASHFFTCONV_VMEM_MB", "100")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT_PATH = os.path.join(os.path.dirname(__file__), "tpu_factor_sweep.json")

# (f0, n1, n2) / (f00, f0, n1, n2) candidates per size; first entry is the
# round-3 default shape (the control).
CANDIDATES = {
    # Small-N direct-vs-Monarch A/B (round-4 session 7): the small-N probe
    # showed the 2-factor kernel at 256-512 runs 3.3-3.7x above the
    # bandwidth floor (VPU-pass-bound); the 1-factor direct-DFT kernel has
    # 2x the FLOPs but they are MXU-shaped. Sweeping fwd AND fwd+bwd (the
    # direct backward is the general-path composite) decides DIRECT_MAX.
    256: [(2, 128), (256,)],
    512: [(4, 128), (512,)],
    1024: [(8, 128), (1024,)],
    65536: [(2, 256, 128), (4, 128, 128), (256, 256)],
    131072: [(4, 256, 128), (2, 512, 128), (256, 512), (512, 256)],
    262144: [(8, 256, 128), (2, 512, 256), (4, 512, 128), (512, 512)],
    # round-4 session-7 additions: untried mid-f0 shapes — 512K's best tried
    # plan (8,512,128) reads fwd MFU 0.234 vs the 0.25 bar, so sweep the
    # (f0, 256, x) family too (bigger f0 amortizes the inner transforms over
    # more MXU-outer bands; smaller inner tiles ease VMEM pressure).
    524288: [(4, 4, 256, 128), (4, 512, 256), (8, 512, 128), (2, 1024, 256),
             (16, 256, 128), (8, 256, 256)],
    1048576: [(8, 4, 256, 128), (8, 512, 256), (4, 1024, 256), (16, 512, 128),
              (16, 256, 256), (32, 256, 128)],
    2097152: [(16, 4, 256, 128), (8, 512, 512), (16, 512, 256), (32, 256, 256)],
    # 4M: no single-pass 3-factor shape fits the budget (best ~135 MB);
    # instead try fatter pipelines — bigger complex inner per butterfly.
    4194304: [(32, 4, 256, 128), (8, 8, 512, 128), (4, 16, 512, 128),
              (16, 8, 256, 128)],
}


def set_b_h(seqlen: int) -> tuple[int, int]:
    # bench.py shapes (16 GB v5e caps)
    if seqlen <= 2048:
        return 16, 768  # the small-N probe / training-regime shape
    if seqlen <= 131072:
        return 2, 384
    if seqlen <= 524288:
        return 1, 192
    if seqlen <= 1048576:
        return 1, 96
    return 1, 32


def main():
    import jax
    import jax.numpy as jnp

    import flashfftconv_tpu as ff
    from flashfftconv_tpu.ops import monarch_pallas as mp
    from flashfftconv_tpu.ops.plan import make_plan
    from flashfftconv_tpu.utils.benchmarking import (
        benchmark_backward,
        benchmark_forward,
    )

    sizes = [
        int(s) for s in os.environ.get("FACTOR_SWEEP_SIZES", "").split(",") if s
    ] or sorted(CANDIDATES)
    rng = np.random.default_rng(0)
    results = []
    if os.path.exists(OUT_PATH):
        try:
            results = json.load(open(OUT_PATH))["results"]
        except Exception:
            results = []
    # Relay/transport errors (remote_compile drops, broken pipes) are
    # transient — drop those rows on resume so they retry; keep rows that
    # failed on a real numeric error for the record. Compile-helper exits
    # ("HTTP 500 ... tpu_compile_helper subprocess exit") were the
    # band-unroll compile-size wall; the fori band loop (round 5,
    # monarch_pallas._BAND_FORI_ROWS) addresses exactly those, so retry
    # them too.
    transient = ("Broken pipe", "read body", "unreachable",
                 "tpu_compile_helper subprocess exit")
    results = [
        r for r in results
        if not any(t in r.get("error", "") for t in transient)
    ]
    done = {(r["seqlen"], tuple(r["factors"])) for r in results}

    def flush():
        json.dump(
            {
                "device": str(jax.devices()[0]),
                "vmem_mb": os.environ["FLASHFFTCONV_VMEM_MB"],
                "results": results,
            },
            open(OUT_PATH, "w"),
            indent=1,
        )

    for n in sizes:
        b, h = set_b_h(n)
        u = jnp.asarray((rng.standard_normal((b, h, n)) * 0.02).astype(np.float32)).astype(jnp.bfloat16)
        k = jnp.asarray(
            (rng.standard_normal((h, n)) * 0.02 * np.exp(-0.1 * np.arange(n))).astype(np.float32)
        )
        pre = jnp.asarray((rng.standard_normal(u.shape) * 0.02).astype(np.float32)).astype(jnp.bfloat16)
        post = jnp.asarray((rng.standard_normal(u.shape) * 0.02).astype(np.float32)).astype(jnp.bfloat16)
        y_ref = None

        for factors in CANDIDATES[n]:
            if (n, tuple(factors)) in done:
                continue
            t0 = time.time()
            rec = {"seqlen": n, "factors": list(factors), "B": b, "H": h}
            try:
                plan = make_plan(n, compute_dtype=jnp.bfloat16, factors=factors)
                rec["supported"] = mp.supported(plan)
                if len(factors) == 3:
                    rec["vmem_est_mb"] = round(mp._fused3_vmem_mb(plan), 1)
                elif len(factors) == 2:
                    rec["vmem_est_mb"] = round(mp._fused2_vmem_mb(plan), 1)
                fn = lambda u_, k_, pre_, post_: mp.fft_conv_pallas(
                    plan, u_, k_, pre_, post_
                )
                y = jax.jit(fn)(u, k, pre, post)
                if y_ref is None:
                    y_ref = ff.fft_conv_reference(n, u, k, pre, post)
                rec["out_err"] = float(
                    jnp.abs(y.astype(jnp.float32) - y_ref.astype(jnp.float32)).max()
                )
                rec["ok"] = rec["out_err"] < 1e-2
                rec["fwd_ms"] = benchmark_forward(fn, u, k, pre, post, repeats=10)
                rec["fwd_bwd_ms"] = benchmark_backward(
                    fn, u, k, pre, post, argnums=(0, 1, 2, 3), repeats=6
                )
                rec["ratio"] = rec["fwd_bwd_ms"] / rec["fwd_ms"]
            except Exception as e:
                rec["ok"] = False
                rec["error"] = repr(e)[:400]
            rec["wall_s"] = round(time.time() - t0, 1)
            results.append(rec)
            flush()
            print(json.dumps(rec), flush=True)

    # summary: fastest OK fwd per size
    for n in sizes:
        rows = [r for r in results if r["seqlen"] == n and r.get("ok")]
        if rows:
            best = min(rows, key=lambda r: r["fwd_ms"])
            print(
                f"BEST {n}: {best['factors']} fwd {best['fwd_ms']:.2f} ms "
                f"fwd_bwd {best['fwd_bwd_ms']:.2f} ms",
                flush=True,
            )


if __name__ == "__main__":
    main()
