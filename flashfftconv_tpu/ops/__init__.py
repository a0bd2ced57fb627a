from flashfftconv_tpu.ops.plan import FftPlan, default_factors, make_plan
from flashfftconv_tpu.ops.dispatch import fft_conv
