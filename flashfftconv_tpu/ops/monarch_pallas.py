"""Fused Pallas TPU kernels for the Monarch FFT convolution.

Placeholder module for the fused single-kernel path (the TPU analog of the
reference's monarch_conv_cuda_kernel family,
csrc/flashfftconv/monarch_cuda/kernels_fp16/monarch_cuda_kernel.h). Until the
kernels land, ``supported`` returns False and dispatch falls back to the
pure-XLA Monarch path.
"""

from __future__ import annotations

import jax

from flashfftconv_tpu.ops.plan import FftPlan


def supported(plan: FftPlan) -> bool:
    return False


def fft_conv_pallas(plan, u, k, pregate=None, postgate=None):
    raise NotImplementedError("Pallas path not yet implemented; use impl='xla'")
