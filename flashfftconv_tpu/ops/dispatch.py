"""Implementation dispatch for the FFT convolution.

Routes a (plan, shapes, platform) combination to an implementation:
  - 'xla':    pure-XLA Monarch einsum path (all sizes; differentiable via AD).
  - 'pallas': fused Pallas TPU kernels with custom VJP (hot path).
  - 'fft':    jnp.fft oracle (debugging / tiny shapes).

The reference's equivalent is the 13-way per-seqlen branch in
``/root/reference/flashfftconv/conv.py:566-1733`` plus dtype routing in
``monarch_fwd.h:278-288``; here routing is a pure-Python decision made at trace
time, so there is no host dispatch cost inside the compiled program.
"""

from __future__ import annotations


import os

import jax
import jax.numpy as jnp

from flashfftconv_tpu.ops import monarch_xla
from flashfftconv_tpu.ops.plan import FftPlan

_IMPLS = ("auto", "pallas", "xla", "fft")


def _default_platform() -> str:
    try:
        return jax.devices()[0].platform
    except RuntimeError:
        return "cpu"


def _pallas_supported(plan: FftPlan) -> bool:
    from flashfftconv_tpu.ops import monarch_pallas

    return monarch_pallas.supported(plan)


def resolve_impl(plan: FftPlan, impl: str = "auto") -> str:
    if impl not in _IMPLS:
        raise ValueError(f"impl must be one of {_IMPLS}, got {impl!r}")
    if impl != "auto":
        return impl
    if os.environ.get("FLASHFFTCONV_FORCE_XLA"):
        return "xla"
    if _default_platform() == "tpu" and _pallas_supported(plan):
        return "pallas"
    return "xla"


def fft_conv(
    plan: FftPlan,
    u: jax.Array,
    k: jax.Array,
    pregate: jax.Array | None = None,
    postgate: jax.Array | None = None,
    impl: str = "auto",
) -> jax.Array:
    """FFT convolution ``postgate * ifft(fft(pre*u) * fft(k)).real[..., :L]``.

    Differentiable w.r.t. u, k, pregate, postgate. See
    :func:`flashfftconv_tpu.ops.monarch_xla.fft_conv_xla` for semantics.
    """
    if (pregate is None) != (postgate is None):
        raise ValueError(
            "pregate and postgate must both be provided or both be None "
            "(parity with /root/reference/flashfftconv/conv.py:556-558)"
        )
    resolved = resolve_impl(plan, impl)
    if resolved == "fft":
        return monarch_xla.fft_conv_reference(plan.seqlen, u, k, pregate, postgate)
    if resolved == "xla":
        return monarch_xla.fft_conv_xla(plan, u, k, pregate, postgate)
    from flashfftconv_tpu.ops import monarch_pallas

    return monarch_pallas.fft_conv_pallas(plan, u, k, pregate, postgate)
