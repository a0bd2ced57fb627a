"""flashfftconv_tpu: TPU-native FlashFFTConv (JAX / XLA / Pallas).

Long depthwise FFT convolutions y = iFFT(FFT(u) * FFT(k)) computed as
Monarch-decomposed batched matmuls on the TPU MXU, with frequency-domain
kernel multiply, input/output gating and implicit causal zero-padding fused
into the compute path. Public API parity with the reference package
(/root/reference/flashfftconv/__init__.py).
"""

from flashfftconv_tpu.module import FlashDepthWiseConv1d, FlashFFTConv
from flashfftconv_tpu.ops.depthwise import depthwise_conv1d
from flashfftconv_tpu.ops.dispatch import fft_conv
from flashfftconv_tpu.ops.monarch_xla import fft_conv_reference, fft_conv_xla
from flashfftconv_tpu.ops.plan import FftPlan, default_factors, make_plan
from flashfftconv_tpu.ops.sparse import frequency_sparse_fft_conv, partial_fft_conv

__version__ = "0.1.0"

# Opt-in persistent XLA compilation cache: big Monarch kernels compile for
# minutes through the TPU relay; set FLASHFFTCONV_COMPILE_CACHE=1 (or a
# directory path) and every CLI/benchmark/example reruns from disk. No-op
# when the env var is unset, so importing the library never mutates global
# JAX config behind the user's back.
from flashfftconv_tpu.utils.compile_cache import enable_compilation_cache as _ecc

_ecc()
del _ecc

__all__ = [
    "FlashFFTConv",
    "FlashDepthWiseConv1d",
    "FftPlan",
    "make_plan",
    "default_factors",
    "fft_conv",
    "fft_conv_xla",
    "fft_conv_reference",
    "depthwise_conv1d",
    "partial_fft_conv",
    "frequency_sparse_fft_conv",
]
