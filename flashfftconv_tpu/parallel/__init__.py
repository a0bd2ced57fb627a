"""Mesh parallelism: DP/TP/SP sharding helpers (`mesh`) and the
sequence-sharded FFT convolution (`seq_conv`) that distributes one long conv
across devices — a capability beyond the reference, whose conv is strictly
single-device (SURVEY.md §5.7)."""

from flashfftconv_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    sequence_sharding,
    zero1_shardings,
    zero2_shardings,
)
from flashfftconv_tpu.parallel.seq_conv import seq_fft_conv, seq_fft_conv_padded

__all__ = [
    "seq_fft_conv_padded",
    "batch_sharding",
    "make_mesh",
    "param_shardings",
    "sequence_sharding",
    "zero1_shardings",
    "zero2_shardings",
    "seq_fft_conv",
]
