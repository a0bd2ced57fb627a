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
    first = args[0]

    def body(c, _):
        out = fn(c, *args[1:])
        return out.astype(first.dtype).reshape(first.shape), None

    def scanned(u, *rest):
        c, _ = jax.lax.scan(lambda c, x: body(c, x), u, None, length=length)
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


def flops_estimate(fn: Callable, *args) -> float:
    """XLA cost-analysis FLOPs of the compiled fn (the fvcore FlopCount
    callback analog, SURVEY.md §5.1)."""
    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", float("nan")))
