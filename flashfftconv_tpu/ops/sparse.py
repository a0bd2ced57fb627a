"""Partial and frequency-sparse FFT convolutions.

Functional equivalents of the reference's ``PartialFFTConv`` and
``FrequencySparseFFTConv`` (/root/reference/flashfftconv/sparse_conv.py:8-38),
which are "example implementations, not optimized" there. Both convolve at
FFT size N = 2*L (linear, non-circular convolution of the causal kernel).

Here the partial conv is additionally wired into the Monarch machinery
(`partial_fft_conv` with a plan): truncating the kernel to ``n_partial`` taps
simply zeroes most of ``k`` before the spectrum is taken, so the optimized
Monarch path applies unchanged — this implements properly what the reference
only sketches via its unused ``monarch_conv_forward_32_32_32_complex_truncated``
kernel (bound at csrc/flashfftconv/monarch.cpp:25; see SURVEY.md §5.7.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flashfftconv_tpu.ops.plan import FftPlan, make_plan
from flashfftconv_tpu.ops import dispatch


def partial_fft_conv(
    x: jax.Array,
    k: jax.Array,
    n_partial: int,
    plan: FftPlan | None = None,
    impl: str = "auto",
) -> jax.Array:
    """Convolution with the kernel truncated to its first ``n_partial`` taps.

    Matches ``PartialFFTConv.forward`` (sparse_conv.py:13-21): FFT size 2*L,
    output truncated back to L.
    """
    length = x.shape[-1]
    k = k[..., :n_partial]
    if plan is not None:
        return dispatch.fft_conv(plan, x, k, impl=impl)
    x_dtype = x.dtype
    n = 2 * length
    x_f = jnp.fft.rfft(x.astype(jnp.float32), n=n, axis=-1)
    k_f = jnp.fft.rfft(k.astype(jnp.float32), n=n, axis=-1)
    y = jnp.fft.irfft(x_f * k_f, n=n, axis=-1)[..., :length]
    return y.astype(x_dtype)


def frequency_sparse_fft_conv(
    x: jax.Array,
    k: jax.Array,
    n_partial: int,
) -> jax.Array:
    """Convolution with the upper kernel spectrum zeroed above n_partial // 2.

    Matches ``FrequencySparseFFTConv.forward`` (sparse_conv.py:29-38):
    FFT size 2*L, rfft bins >= n_partial // 2 of the kernel are dropped.
    """
    length = x.shape[-1]
    x_dtype = x.dtype
    n = 2 * length
    x_f = jnp.fft.rfft(x.astype(jnp.float32), n=n, axis=-1)
    k_f = jnp.fft.rfft(k.astype(jnp.float32), n=n, axis=-1)
    n_bins = k_f.shape[-1]
    keep = jnp.arange(n_bins) < (n_partial // 2)
    k_f = jnp.where(keep, k_f, 0.0)
    y = jnp.fft.irfft(x_f * k_f, n=n, axis=-1)[..., :length]
    return y.astype(x_dtype)


class PartialFFTConv:
    """Class-style wrapper matching the reference's ``PartialFFTConv``
    module API (sparse_conv.py:8-21): construct with ``n_partial``, call
    with (x, k)."""

    def __init__(self, n_partial: int, plan: FftPlan | None = None):
        self.n_partial = n_partial
        self.plan = plan

    def __call__(self, x: jax.Array, k: jax.Array) -> jax.Array:
        return partial_fft_conv(x, k, self.n_partial, plan=self.plan)


class FrequencySparseFFTConv:
    """Class-style wrapper matching the reference's ``FrequencySparseFFTConv``
    module API (sparse_conv.py:23-38)."""

    def __init__(self, n_partial: int):
        self.n_partial = n_partial

    def __call__(self, x: jax.Array, k: jax.Array) -> jax.Array:
        return frequency_sparse_fft_conv(x, k, self.n_partial)
