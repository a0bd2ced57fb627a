"""Mesh parallelism: DP/TP/SP sharding helpers (`mesh`), the sequence-sharded
FFT convolution (`seq_conv`) that distributes one long conv across devices,
and SPMD pipeline parallelism (`pipeline`) — the latter two are capabilities
beyond the reference, whose conv is strictly single-device and which has no
pipeline/expert parallelism at all (SURVEY.md §2.6, §5.7)."""

from flashfftconv_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    sequence_sharding,
    zero1_shardings,
    zero2_shardings,
)
from flashfftconv_tpu.parallel.pipeline import (
    pipeline_apply,
    stack_stage_params,
    stage_param_shardings,
)
from flashfftconv_tpu.parallel.seq_conv import seq_fft_conv, seq_fft_conv_padded

__all__ = [
    "seq_fft_conv_padded",
    "batch_sharding",
    "make_mesh",
    "param_shardings",
    "pipeline_apply",
    "sequence_sharding",
    "stack_stage_params",
    "stage_param_shardings",
    "zero1_shardings",
    "zero2_shardings",
    "seq_fft_conv",
]
