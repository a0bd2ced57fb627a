"""H3 operator with long-conv kernels on FlashFFTConv (flax).

Port of the reference's H3Conv
(/root/reference/examples/hyena/src/models/sequence/h3_conv.py:20-141) and its
LongConvKernel (src/models/sequence/long_conv_kernel.py:8-77):

  q, k, v = projections(u)
  k <- shift-conv(k, k_kernel) + k_D * k          (the "shift SSM")
  y <- conv(k*v, ssm_kernel) + D * (k*v)          (the "diagonal SSM")
  out = output_linear(q * y)                       (head_dim=1; general
                                                    head_dim sums over d1)
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from flashfftconv_tpu.ops import dispatch
from flashfftconv_tpu.ops.plan import get_plan


class LongConvKernel(nn.Module):
    """Learnable long-conv kernel with squash operator
    relu(|k| - lam) * sign(k) (long_conv_kernel.py:69-77).

    weight_init: "random" (randn*0.002) or "double_exp" (randn*0.02 scaled by
    a per-(h, l) double-exponential decay, long_conv_kernel.py:58-66).
    use_ma_smoothing: moving-average smoothing of the kernel before the
    squash — time-domain (uniform window, the reference's AvgPool1d path) or
    frequency-domain when smooth_freq=True (gaussian window correlated over
    rfft bins, long_conv_kernel.py:70-76).
    bandlimit: fraction (0, 1] of the kernel's rfft band to keep — the
    progressive-resizing hook the reference callback sets on modules
    (callbacks/progressive_resizing.py:85-94); frequencies above
    bandlimit * n_bands are zeroed so low-resolution training stages see an
    anti-aliased kernel."""

    h: int
    l_max: int
    channels: int = 1
    lam: float = 0.1
    causal: bool = True
    kernel_dropout: float = 0.0
    weight_init: str = "random"
    use_ma_smoothing: bool = False
    ma_window_len: int = 7
    smooth_freq: bool = False
    bandlimit: float | None = None

    @nn.compact
    def __call__(self, deterministic: bool = True):
        length = self.l_max if self.causal else 2 * self.l_max

        def init(key, shape):
            if self.weight_init == "random":
                return jax.random.normal(key, shape) * 0.002
            if self.weight_init == "double_exp":
                k = jax.random.normal(key, shape) * 0.02
                i = jnp.arange(self.h)[:, None] / self.h
                j = jnp.arange(length)[None, :] / length
                decay = jnp.exp(-j * (self.h / 2) ** i)  # (h, l)
                return k * decay[None]
            raise NotImplementedError(f"{self.weight_init} is not valid")

        k = self.param("kernel", init, (self.channels, self.h, length))

        if self.use_ma_smoothing:
            if self.smooth_freq:
                w = jnp.arange(self.ma_window_len, dtype=jnp.float32)
                w = jnp.exp(-0.5 * jnp.abs(w - self.ma_window_len // 2) ** 2)
                k_f = jnp.fft.rfft(k, axis=-1)
                smooth = jax.vmap(lambda row: jnp.convolve(row, w.astype(row.dtype), mode="same"))
                flat = k_f.reshape(-1, k_f.shape[-1])
                k_f = smooth(flat).reshape(k_f.shape)
                k = jnp.fft.irfft(k_f, n=length, axis=-1)
            else:
                assert self.ma_window_len % 2 != 0, "window size must be odd"
                w = jnp.full((self.ma_window_len,), 1.0 / self.ma_window_len)
                smooth = jax.vmap(lambda row: jnp.convolve(row, w, mode="same"))
                k = smooth(k.reshape(-1, length)).reshape(k.shape)

        if self.bandlimit is not None:
            n_bands = length // 2 + 1
            keep = jnp.arange(n_bands) < self.bandlimit * n_bands
            k_f = jnp.fft.rfft(k, axis=-1) * keep
            k = jnp.fft.irfft(k_f, n=length, axis=-1)

        k = nn.relu(jnp.abs(k) - self.lam) * jnp.sign(k)
        if self.kernel_dropout > 0:
            k = nn.Dropout(rate=self.kernel_dropout)(k, deterministic=deterministic)
        return k


class H3Operator(nn.Module):
    d_model: int
    l_max: int
    head_dim: int = 1
    kernel_lam: float = 0.1
    conv_dtype: Any = jnp.bfloat16
    impl: str = "auto"
    dropout: float = 0.0  # absorbed, parity with the reference signature
    # Kernel generators: "long-conv" is the H3Conv variant (h3_conv.py, the
    # flashfftconv default); "shift"/"s4d" reproduce the original H3's
    # shift-SSM k-projection and diagonal-SSM v-path (h3.py via
    # ss_kernel.py modes 'shift'/'diag').
    k_kernel_type: str = "long-conv"  # "long-conv" | "shift"
    ssm_kernel_type: str = "long-conv"  # "long-conv" | "s4d"
    d_state: int = 64

    @nn.compact
    def __call__(self, u, deterministic: bool = True):
        # u: (B, L, D)
        b, l, d = u.shape
        assert d == self.d_model and d % self.head_dim == 0
        n_heads = d // self.head_dim
        seqlen = 2 * self.l_max
        plan = get_plan(seqlen, jnp.dtype(self.conv_dtype).name)
        conv = lambda x, k: dispatch.fft_conv(plan, x, k, impl=self.impl)

        q = nn.Dense(d, dtype=u.dtype, name="q_proj")(u)
        k = nn.Dense(d, dtype=u.dtype, name="k_proj")(u)
        v = nn.Dense(d, dtype=u.dtype, name="v_proj")(u)
        q, k, v = (jnp.swapaxes(x, -1, -2) for x in (q, k, v))  # (B, D, L)

        if self.k_kernel_type == "shift":
            from flashfftconv_tpu.models.ssm import SSKernelShift

            k_kernel = SSKernelShift(d, d_state=self.d_state, name="k_kernel")(
                self.l_max
            )[0]
        else:
            k_kernel = LongConvKernel(
                d, self.l_max, lam=self.kernel_lam, name="k_kernel"
            )(deterministic)[0]
        if self.ssm_kernel_type == "s4d":
            from flashfftconv_tpu.models.ssm import S4DKernel

            ssm_kernel = S4DKernel(d, n_state=self.d_state, name="kernel")(
                self.l_max
            )
        else:
            ssm_kernel = LongConvKernel(
                d, self.l_max, lam=self.kernel_lam, name="kernel"
            )(deterministic)[0]
        k_d = self.param("k_D", nn.initializers.normal(1.0), (d,))
        d_skip = self.param("D", nn.initializers.normal(1.0), (n_heads,))

        # Shift SSM: k <- conv(k, k_kernel) + k_D * k (h3_conv.py:100-105).
        k = conv(k, k_kernel) + k_d[None, :, None] * k

        if self.head_dim == 1:
            kv = k * v
            y = conv(kv, ssm_kernel) + jnp.repeat(
                d_skip, self.head_dim
            )[None, :, None] * kv
            y = y * q
        else:
            # kv: (B, d1, d2, Hh, L) outer product over head dims
            # (h3_conv.py:118-135).
            hd = self.head_dim
            k_r = k.reshape(b, n_heads, hd, l)
            v_r = v.reshape(b, n_heads, hd, l)
            kv = k_r[:, :, :, None] * v_r[:, :, None, :]  # (B, Hh, d1, d2, L)
            kv_flat = kv.reshape(b, n_heads * hd * hd, l)
            ssm_rep = jnp.repeat(
                ssm_kernel.reshape(n_heads, hd, l), hd, axis=1
            ).reshape(n_heads * hd * hd, l)
            y = conv(kv_flat, ssm_rep).reshape(b, n_heads, hd, hd, l)
            y = y + kv * d_skip[None, :, None, None, None]
            q_r = q.reshape(b, n_heads, hd, 1, l)
            y = (y * q_r).sum(axis=2).reshape(b, d, l)

        y = jnp.swapaxes(y, -1, -2)
        return nn.Dense(d, dtype=u.dtype, name="output_linear")(y)
