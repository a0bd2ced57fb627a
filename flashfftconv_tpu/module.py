"""Public module API: FlashFFTConv and FlashDepthWiseConv1d.

Drop-in equivalents of the reference's two exported modules
(/root/reference/flashfftconv/__init__.py:1-2), re-expressed functionally for
JAX. Usage pattern matches the reference (README.md:108-133): create ONE
FlashFFTConv per model for a fixed FFT size and share it across layers — it
owns the precomputed DFT/twiddle tables (here: an FftPlan pytree instead of
registered CUDA buffers).

    conv = FlashFFTConv(32768, dtype=jnp.bfloat16)
    y = conv(u, k)                      # u: (B, H, L<=N), k: (H, k_len<=N)
    y = conv(u, k, pregate, postgate)   # gated variant

Unlike the reference (fp16/bf16 only, L % 2 == 0, H % 16 for long seqlens —
README.md:269-270), any even-or-odd L <= N and any H are accepted; dtype may
also be float32.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from flashfftconv_tpu.ops import dispatch
from flashfftconv_tpu.ops.depthwise import depthwise_conv1d
from flashfftconv_tpu.ops.plan import FftPlan, make_plan


class FlashFFTConv:
    """Monarch FFT convolution with a shared per-model plan.

    Args:
      seqlen: FFT size N (power of two, 256..4,194,304).
      dtype: matmul operand dtype (bfloat16 recommended on TPU; float32 for
        highest accuracy). Tables are always stored f32 and accumulation is f32.
      use_32_butterfly: accepted for API parity with the reference ctor
        (/root/reference/flashfftconv/conv.py:72); the TPU decomposition is
        chosen by ``plan.default_factors`` instead.
      impl: 'auto' | 'pallas' | 'xla' | 'fft'.
      remat: if True (default), recompute the conv in the backward pass
        instead of saving intermediates — the reference's memory policy
        (conv.py:587-588 saves only inputs).
    """

    def __init__(
        self,
        seqlen: int,
        dtype: Any = jnp.bfloat16,
        use_32_butterfly: bool = True,
        impl: str = "auto",
        remat: bool = True,
    ):
        del use_32_butterfly
        self.seqlen = seqlen
        self.dtype = jnp.dtype(dtype)
        self.impl = impl
        self.plan: FftPlan = make_plan(seqlen, compute_dtype=self.dtype)
        self._remat = remat

    def __call__(self, u, k, pregate=None, postgate=None):
        if pregate is not None or postgate is not None:
            if pregate is None or postgate is None:
                raise ValueError("pregate and postgate must be passed together")

            def f(u, k, pregate, postgate):
                return dispatch.fft_conv(
                    self.plan, u, k, pregate, postgate, impl=self.impl
                )

            if self._remat:
                f = jax.checkpoint(f)
            return f(u, k, pregate, postgate)

        def f(u, k):
            return dispatch.fft_conv(self.plan, u, k, impl=self.impl)

        if self._remat:
            f = jax.checkpoint(f)
        return f(u, k)


@dataclasses.dataclass
class FlashDepthWiseConv1d:
    """Short depthwise conv1d, API parity with the reference module
    (/root/reference/flashfftconv/depthwise_1d.py:25-55).

    Stateless in JAX style: weights/bias are passed to __call__ (or bound at
    construction for drop-in use). Layouts: is_bhl=True expects x (B, D, L)
    and weights (D, K); is_bhl=False expects x (B, L, D) and weights (K, D)
    (the reference stores BLH weights pre-transposed, depthwise_1d.py:35).
    """

    channels: int
    kernel_size: int
    padding: int
    weights: jax.Array | None = None
    bias: jax.Array | None = None
    is_bhl: bool = True

    def __call__(self, x, weights=None, bias=None):
        w = weights if weights is not None else self.weights
        b = bias if bias is not None else self.bias
        if w is None:
            raise ValueError("weights must be provided at call or construction")
        return depthwise_conv1d(x, w, b, padding=self.padding, is_bhl=self.is_bhl)
