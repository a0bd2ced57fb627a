"""Headline benchmark: FlashFFTConv-TPU vs jnp.fft convolution on the attached chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where value is
the geometric-mean speedup of the gated forward conv over the jnp.fft oracle
across seqlens (the reference's headline is the same comparison vs PyTorch FFT
conv, README.md:224-231; BASELINE.json targets >=4x at 32K-1M). Below 64K the
per-size speedup is scan-amortized (16 serially-dependent convs inside one jit,
measured identically for both implementations — the per-call cost a training
step pays); one-shot times are logged alongside. Per-size algorithmic GFLOP/s
and MFU (Monarch MXU FLOPs / peak bf16) are logged to stderr.

Shapes follow the reference benchmark methodology: B=16/H=768-class workloads
with B,H capped at large seqlens (benchmarks/benchmark_flashfftconv.py:28-59),
bf16 activations, f32 kernels. Override sizes with BENCH_SIZES=comma,list.
Diagnostics go to stderr; only the JSON line goes to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def set_b_h(seqlen: int) -> tuple[int, int]:
    """B/H caps per seqlen, scaled for a 16 GB v5e chip (reference caps are for
    40-80 GB GPUs; tests/test_flashfftconv.py:15-46)."""
    if seqlen <= 4096:
        return 16, 768
    if seqlen <= 32768:
        return 8, 768
    if seqlen <= 131072:
        return 2, 384
    if seqlen <= 524288:
        return 1, 192
    if seqlen <= 1048576:
        return 1, 96
    return 1, 32


def sync(out):
    """Force REAL completion by reading one element back to the host —
    jax.block_until_ready through the axon relay can degrade to a no-op
    (observed: 4 GB ops "completing" in 40 us), a readback cannot lie."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    sc = leaf if getattr(leaf, "ndim", 0) == 0 else leaf.ravel()[0]
    np.asarray(jax.device_get(sc))


def timeit(f, *args, iters=None, warmup=2):
    """Pipelined timing: sync once after the loop. The axon relay charges a
    fixed ~30 ms host<->device round trip per sync, so the iteration
    count is auto-scaled until the loop body dominates (>= ~2 s or 200
    iters), then the sync cost is subtracted via a two-point fit:
    t_n = T + C/n measured at n and 2n gives T = 2*t_2n - t_n."""

    for _ in range(warmup):
        out = f(*args)
    sync(out)

    def loop(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = f(*args)
        sync(out)
        return (time.perf_counter() - t0) / n

    if iters is None:
        est = loop(3)
        iters = max(10, min(200, int(2.0 / max(est, 1e-4))))
    # Min of three two-point fits: the chip behind the relay is shared, so a
    # single fit can eat a tenant-contention spike; the minimum estimates the
    # uncontended time (same estimator as utils/benchmarking.py).
    fits = []
    for _ in range(3):
        t_half = loop(max(iters // 2, 1))
        t_full = loop(iters)
        # subtract the per-loop fixed sync cost (never below the average/2)
        fits.append(max(2 * t_full - t_half, t_full / 2))
    return min(fits)


def device_reachable(timeout_s: float = 180.0) -> bool:
    """True when a tiny op + readback completes within timeout_s.

    The axon relay to the chip can die (observed 2026-08-17); when it does,
    device puts and jit calls block FOREVER rather than raising. Probe in a
    daemon thread so a dead relay turns into a fast, explicit failure
    instead of a hung benchmark process."""
    import threading

    ok = []

    def _probe():
        import jax
        import jax.numpy as jnp

        x = jnp.ones((128, 128))
        np.asarray(jax.device_get((x @ x).ravel()[0]))
        ok.append(True)

    t = threading.Thread(target=_probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok)


def main():
    # Hard watchdog: never let the whole bench exceed BENCH_TIMEOUT seconds
    # (the relay can also die mid-run, hanging a later sync). os._exit from
    # a timer thread is the only exit that works while the main thread is
    # blocked inside a device readback.
    import threading

    budget = float(os.environ.get("BENCH_TIMEOUT", "3600"))

    def _abort():
        log(f"bench.py: exceeded BENCH_TIMEOUT={budget:.0f}s — device link "
            "likely dead mid-run; aborting without a result line")
        os._exit(4)

    watchdog = threading.Timer(budget, _abort)
    watchdog.daemon = True
    watchdog.start()

    if not device_reachable():
        log("bench.py: device unreachable (probe timed out) — the TPU relay "
            "is down; refusing to emit a bogus result line")
        # os._exit, not sys.exit: the axon client's C++ teardown aborts the
        # interpreter (SIGABRT, rc 134) when atexit runs with the relay dead,
        # clobbering the clean rc=3 refusal (observed in BENCH_r03.json).
        sys.stderr.flush()
        os._exit(3)

    import jax
    import jax.numpy as jnp

    import flashfftconv_tpu as ff

    sizes = [
        int(s)
        for s in os.environ.get(
            "BENCH_SIZES", "256,1024,4096,32768,262144,1048576"
        ).split(",")
    ]
    iters = int(os.environ.get("BENCH_ITERS", "0")) or None
    rng = np.random.default_rng(0)

    from flashfftconv_tpu.ops.plan import default_factors
    from flashfftconv_tpu.utils.benchmarking import conv_throughput

    # Below this size the fixed per-jit-call dispatch (a ~ms host->device
    # round trip through the relay) rivals the kernel itself, so the
    # headline uses the scan-amortized per-call time — SCAN_LEN
    # serially-dependent convs chained inside ONE jit, measured identically
    # for BOTH implementations. That is the cost a training step actually
    # pays (every model invokes the conv dozens of times per jitted step);
    # the one-shot time is also logged for transparency.
    AMORTIZE_BELOW = 65536
    SCAN_LEN = 16

    def amortized(fn, u, *unused_rest):
        # operands arrive as jit ARGUMENTS (closing over them would embed
        # them as MLIR constants — hundreds of MB at large B*H*L)
        def scanned(u0, *rest):
            def body(c, _):
                out = fn(c, *rest)
                return out.astype(u0.dtype).reshape(u0.shape), None

            c, _ = jax.lax.scan(body, u0, None, length=SCAN_LEN)
            return c

        return jax.jit(scanned)

    speedups = []
    details = {}
    for n in sizes:
        b, h = set_b_h(n)
        u = jnp.asarray(rng.standard_normal((b, h, n)).astype(np.float32) * 0.02).astype(jnp.bfloat16)
        k = jnp.asarray(
            (rng.standard_normal((h, n)) * 0.02 * np.exp(-0.1 * np.arange(n))).astype(np.float32)
        )
        pre = jnp.asarray(rng.standard_normal(u.shape).astype(np.float32) * 0.02).astype(jnp.bfloat16)
        post = jnp.asarray(rng.standard_normal(u.shape).astype(np.float32) * 0.02).astype(jnp.bfloat16)

        conv = ff.FlashFFTConv(n, dtype=jnp.bfloat16)
        mine = jax.jit(lambda u, k, pre, post: conv(u, k, pre, post))
        orac = jax.jit(lambda u, k, pre, post: ff.fft_conv_reference(n, u, k, pre, post))

        t_mine = timeit(mine, u, k, pre, post, iters=iters)
        t_ref = timeit(orac, u, k, pre, post, iters=iters, warmup=1)
        row = {"flash_ms": t_mine * 1e3, "jnpfft_ms": t_ref * 1e3,
               "speedup": t_ref / t_mine}
        if n < AMORTIZE_BELOW:
            t_mine = timeit(amortized(mine, u, k, pre, post), u, k, pre, post,
                            iters=iters) / SCAN_LEN
            t_ref = timeit(amortized(orac, u, k, pre, post), u, k, pre, post,
                           iters=iters, warmup=1) / SCAN_LEN
            row["flash_amort_ms"] = t_mine * 1e3
            row["jnpfft_amort_ms"] = t_ref * 1e3
            row["speedup_amort"] = t_ref / t_mine
        sp = t_ref / t_mine
        thru = conv_throughput(n, default_factors(n), b, h, t_mine * 1e3, gated=True)
        row["gflops_algo"] = thru["gflops_algo"]
        row["mfu"] = thru["mfu"]
        speedups.append(sp)
        details[n] = row
        log(
            f"N={n} B={b} H={h}: flash {t_mine*1e3:.2f} ms, jnp.fft "
            f"{t_ref*1e3:.2f} ms, {sp:.2f}x"
            + (" (scan-amortized)" if n < AMORTIZE_BELOW else "")
            + f" | {thru['gflops_algo']:.0f} GFLOP/s (algo), MFU {thru['mfu']*100:.1f}%"
        )

    value = float(np.exp(np.mean(np.log(speedups))))
    log("details:", json.dumps(details))
    print(
        json.dumps(
            {
                "metric": "gated_fftconv_speedup_vs_jnpfft_geomean",
                "value": round(value, 3),
                "unit": "x",
                "vs_baseline": round(value, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
