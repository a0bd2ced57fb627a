"""Benchmark + profiling helpers.

TPU-native equivalents of the reference's benchmark utilities
(/root/reference/benchmarks/benchmark.py:8-50: torch.utils.benchmark wrappers
benchmark_forward/backward/memory) and its pytorch_profiler helper:
wall-clock timing under jit with block_until_ready, compiled-memory
introspection via XLA's memory analysis, and jax.profiler trace capture
(Chrome-trace / TensorBoard equivalent of the reference's Nsight/-lineinfo
flow, SURVEY.md §5.1).
"""

from __future__ import annotations

import contextlib
import math
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    """Force REAL completion of `out`'s program by reading one element back
    to the host. jax.block_until_ready is the natural choice, but through
    the axon relay it can degrade to a no-op (observed: a 4 GB-traffic op
    "completing" in 40 us), silently corrupting every timing; a scalar
    readback cannot lie. The extra fixed cost (~30 ms round trip) is
    cancelled by the two-point fit in benchmark_forward."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    sc = leaf if getattr(leaf, "ndim", 0) == 0 else leaf.ravel()[0]
    np.asarray(jax.device_get(sc))


def benchmark_forward(fn: Callable, *args, repeats: int = 10, warmup: int = 3,
                      desc: str = "", verbose: bool = False, samples: int = 3):
    """Wall-clock of fn(*args) in ms, pipelined (single sync after the
    loop — per-call block_until_ready pays a host<->device round trip per
    iteration, ~25 ms through the axon relay, swamping short kernels). The
    fixed per-loop sync cost is cancelled with a two-point fit: measuring
    the loop at n and 2n iterations gives T = 2*t_2n - t_n. The iteration
    count auto-scales until the loop body dominates the sync cost, and the
    fit is repeated `samples` times with the median taken — a single noisy
    fit can otherwise produce impossible orderings (fwd > fwd+bwd) at small
    sizes."""
    f = jax.jit(fn) if not isinstance(fn, jax.stages.Wrapped) else fn
    for _ in range(warmup):
        out = f(*args)
    _sync(out)

    def loop(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = f(*args)
        _sync(out)
        return (time.perf_counter() - t0) / n

    # Auto-scale: enough iterations that the loop runs >= ~0.5 s (or the
    # requested repeats, whichever is larger), so the ~25 ms sync is noise.
    est = loop(max(repeats // 2, 1))
    iters = max(repeats, min(300, int(0.5 / max(est, 1e-5))))

    fits = []
    for _ in range(max(samples, 1)):
        t_half = loop(max(iters // 2, 1))
        t_full = loop(iters)
        fits.append(max(2 * t_full - t_half, t_full / 2))
    # Min of the fits, not median: the chip behind the relay is shared, so
    # individual fits carry contention spikes; the minimum estimates the
    # uncontended kernel time (and is the standard benchmark estimator).
    best = float(np.min(fits)) * 1e3
    if verbose:
        print(f"{desc}: {best:.3f} ms")
    return best


def benchmark_forward_amortized(fn: Callable, *args, length: int = 16,
                                repeats: int = 10, warmup: int = 2,
                                desc: str = "", verbose: bool = False):
    """Per-call wall-clock of fn in ms with host dispatch amortized away:
    `length` serially-dependent applications are chained inside ONE jit via
    lax.scan (each iteration's output feeds the next input, so nothing can
    be elided or overlapped), and the loop time is divided by `length`.

    benchmark_forward measures the per-dispatch cost a user pays issuing one
    conv per jit call — through the axon relay that includes a fixed ~ms
    host->device dispatch per call, which dominates short kernels (N<=2K).
    This measures the device-side compute a user pays when the conv sits
    inside a larger jitted step (the training-loop regime, where every model
    invokes the conv dozens of times per step). Both are honest; they answer
    different questions."""
    def scanned(u, *rest):
        # operands arrive as jit arguments: closing over them would embed
        # them as MLIR constants, which XLA may constant-fold (e.g. the
        # kernel's FFT), making the measurement unfairly fast.
        def body(c, _):
            out = fn(c, *rest)
            return out.astype(u.dtype).reshape(u.shape), None

        c, _ = jax.lax.scan(body, u, None, length=length)
        return c

    t = benchmark_forward(scanned, *args, repeats=repeats, warmup=warmup,
                          desc=desc, verbose=False)
    per_call = t / length
    if verbose:
        print(f"{desc}: {per_call:.3f} ms/call (x{length} scan)")
    return per_call


def benchmark_backward(fn: Callable, *args, argnums=(0,), repeats: int = 10,
                       warmup: int = 3, desc: str = "", verbose: bool = False):
    """Median wall-clock of grad(sum(fn))(args) in ms (fwd+bwd)."""
    g = jax.jit(
        jax.grad(lambda *a: jnp.sum(fn(*a).astype(jnp.float32) ** 2), argnums=argnums)
    )
    return benchmark_forward(g, *args, repeats=repeats, warmup=warmup,
                             desc=desc or "backward", verbose=verbose)


def benchmark_backward_amortized(fn: Callable, *args, argnums=(0,),
                                 length: int = 8, repeats: int = 10,
                                 warmup: int = 2, desc: str = "",
                                 verbose: bool = False):
    """Per-call fwd+bwd wall-clock in ms with host dispatch amortized away:
    grad of `length` serially-chained applications inside one jit (the
    backward chains too), divided by `length` — the fwd+bwd analog of
    benchmark_forward_amortized, and the per-call cost a training step pays
    (sub-ms one-shot rows through the axon relay are timing noise)."""
    def chained_loss(u, *rest):
        def body(c, _):
            out = fn(c, *rest)
            return out.astype(u.dtype).reshape(u.shape), None

        c, _ = jax.lax.scan(body, u, None, length=length)
        return jnp.sum(c.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(chained_loss, argnums=argnums))
    t = benchmark_forward(g, *args, repeats=repeats, warmup=warmup,
                          desc=desc or "backward", verbose=False)
    per_call = t / length
    if verbose:
        print(f"{desc}: {per_call:.3f} ms/call fwd+bwd (x{length} scan)")
    return per_call


def benchmark_memory(fn: Callable, *args, desc: str = "", verbose: bool = False):
    """Peak temporary + output memory of the compiled fn in MB (XLA's static
    memory analysis — the TPU analog of torch.cuda.max_memory_allocated)."""
    compiled = jax.jit(fn).lower(*args).compile()
    try:
        analysis = compiled.memory_analysis()
        total = (
            analysis.temp_size_in_bytes
            + analysis.output_size_in_bytes
            + analysis.argument_size_in_bytes
        )
    except Exception:
        return float("nan")
    mb = total / 2**20
    if verbose:
        print(f"{desc}: {mb:.1f} MB")
    return mb


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/jax-trace"):
    """jax.profiler trace context (view in TensorBoard / xprof / Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


# --- FLOP models + MFU --------------------------------------------------
#
# BASELINE.json's metric is "conv GFLOP/s & speedup"; these give the two
# throughput numbers the grid and bench.py publish:
#  * algorithmic GFLOP/s — the textbook FFT-conv work (3 FFTs + pointwise
#    multiply) divided by wall-clock; comparable across implementations.
#  * MFU — the MXU matmul FLOPs the Monarch chain actually executes divided
#    by wall-clock and the chip's peak bf16 FLOP/s; measures how well the
#    kernels feed the systolic array.

# Peak bf16 FLOP/s per chip by device_kind substring (public spec sheets).
_TPU_PEAK_BF16 = (
    ("v6 lite", 918e12), ("v6e", 918e12),
    ("v5 lite", 197e12), ("v5e", 197e12),
    ("v5p", 459e12), ("v5", 459e12),
    ("v4", 275e12),
)


def tpu_peak_flops(device=None) -> float | None:
    """Peak bf16 FLOP/s of the attached chip, or None if unknown."""
    import jax

    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for key, peak in _TPU_PEAK_BF16:
        if key in kind:
            return peak
    return None


def fftconv_algo_flops(seqlen: int, b: int, h: int, gated: bool = False) -> float:
    """Algorithmic FLOPs of one FFT convolution over (b, h) channels:
    3 complex FFTs at 5*N*log2(N) real FLOPs each (the standard FFT count)
    plus the 6N pointwise complex spectrum multiply (+2N per gate)."""
    n = float(seqlen)
    per_channel = 15.0 * n * math.log2(n) + 6.0 * n + (4.0 * n if gated else 0.0)
    return per_channel * b * h


def monarch_mxu_flops(seqlen: int, factors: tuple[int, ...], b: int, h: int) -> float:
    """MXU matmul FLOPs the default fused forward dispatch executes per conv
    (even-B real-pair packing assumed; each complex matmul is 3 real matmuls
    via Karatsuba — see ops/monarch_pallas.py cmm_left).

    Per real channel:
      1 factor (direct DFT): 6*N^2           (dense (N,N) DFT + iDFT chain)
      2 factors (n1, n2):    6*N*(g*n1 + n2) (stage-1 runs as a g-channel
                              block-diagonal matmul, g = 128//n1, to keep the
                              MXU contraction depth at 128 — those are real
                              executed FLOPs, so MFU counts them)
      3 factors (f0,n1,n2):  6*N*(n1 + n2)   (outer f0-point DFT is unrolled
                              VPU multiply-adds, not MXU; inner 2-way chain
                              runs once per outer band)
      4 factors:             6*N*(n1 + n2 + f00)  (adds the Pallas outer
                              butterfly matmul over f00)
    """
    n = float(seqlen)
    if len(factors) == 1:
        per = 6.0 * n * n
    elif len(factors) == 2:
        n1, n2 = factors
        g = max(1, 128 // n1)
        per = 6.0 * n * (g * n1 + n2)
    elif len(factors) == 3:
        _, n1, n2 = factors
        per = 6.0 * n * (n1 + n2)
    else:
        f00, _, n1, n2 = factors
        per = 6.0 * n * (n1 + n2 + f00)
    return per * b * h


def conv_throughput(seqlen: int, factors: tuple[int, ...], b: int, h: int,
                    ms: float, gated: bool = False) -> dict:
    """GFLOP/s + MFU for one measured conv forward: algorithmic GFLOP/s
    (work / time, implementation-independent) and MFU (executed Monarch MXU
    FLOPs / time / chip peak bf16)."""
    secs = ms * 1e-3
    algo = fftconv_algo_flops(seqlen, b, h, gated=gated)
    mxu = monarch_mxu_flops(seqlen, factors, b, h)
    peak = tpu_peak_flops()
    return {
        "gflops_algo": algo / secs / 1e9,
        "gflops_mxu": mxu / secs / 1e9,
        "mfu": (mxu / secs / peak) if peak else float("nan"),
    }


def flops_estimate(fn: Callable, *args) -> float:
    """XLA cost-analysis FLOPs of the compiled fn (the fvcore FlopCount
    callback analog, SURVEY.md §5.1)."""
    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", float("nan")))
