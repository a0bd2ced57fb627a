"""State-space-model convolution kernel generators (S4D family).

TPU ports of the reference's SSM kernel zoo
(/root/reference/examples/hyena/src/models/sequence/ssm/: S4D, S4-simple and
the SS kernels consumed by LongConv-style mixers). These generate the (H, L)
long-conv kernels that FlashFFTConv consumes — the SSM recurrences become
closed-form kernel evaluations, which on TPU are small einsums.

S4D (diagonal SSM): k[h, t] = Re( sum_n C[h,n] * exp(dt[h] * A[h,n] * t) *
(exp(dt*A)-1)/A ) with A = -exp(log_A_real) + i*A_imag — the ZOH
discretization of a diagonal state space model.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class S4DKernel(nn.Module):
    """Diagonal state-space conv-kernel generator (S4D-Lin initialization).

    Returns (H, L) real kernels. Parameters follow the standard S4D
    parameterization: log-dt per channel, diagonal A = -exp(log_A_re) + i*A_im
    (A_im initialized to the S4D-Lin pi*n grid), complex C.
    """

    h: int
    n_state: int = 64  # state dimension N (half, complex pairs)
    dt_min: float = 1e-3
    dt_max: float = 1e-1

    @nn.compact
    def __call__(self, length: int):
        n = self.n_state // 2

        def init_log_dt(key, shape):
            u = jax.random.uniform(key, shape)
            return u * (math.log(self.dt_max) - math.log(self.dt_min)) + math.log(
                self.dt_min
            )

        log_dt = self.param("log_dt", init_log_dt, (self.h,))
        log_a_re = self.param(
            "log_A_real", lambda key, s: jnp.log(0.5 * jnp.ones(s)), (self.h, n)
        )
        a_im = self.param(
            "A_imag",
            lambda key, s: jnp.broadcast_to(math.pi * jnp.arange(n), s).astype(
                jnp.float32
            ),
            (self.h, n),
        )
        c = self.param(
            "C", lambda key, s: jax.random.normal(key, s) * (0.5**0.5), (self.h, n, 2)
        )

        dt = jnp.exp(log_dt)[:, None]  # (H, 1)
        a = -jnp.exp(log_a_re) + 1j * a_im  # (H, N)
        c_cplx = c[..., 0] + 1j * c[..., 1]
        dt_a = a * dt  # (H, N)
        # ZOH-style input matrix absorbed into C: C * (exp(dtA)-1)/A
        c_eff = c_cplx * (jnp.exp(dt_a) - 1.0) / a
        t = jnp.arange(length)
        # k[h, t] = 2 * Re( sum_n c_eff[h, n] * exp(dt_a[h, n] * t) )
        k = jnp.einsum("hn,hnl->hl", c_eff, jnp.exp(dt_a[..., None] * t))
        return 2 * k.real


class SimpleLongConvKernel(nn.Module):
    """The 'SS-simple' free-form kernel with exponential-decay envelope —
    the reference's simplest SSM alternative (src/models/sequence/ssm/):
    k = w * exp(-|decay| * t / L), both learnable."""

    h: int
    channels: int = 1

    @nn.compact
    def __call__(self, length: int):
        w = self.param(
            "w",
            lambda key, s: jax.random.normal(key, s) * (1.0 / length),
            (self.channels, self.h, length),
        )
        decay = self.param(
            "decay",
            lambda key, s: jax.random.uniform(key, s, minval=0.5, maxval=4.0),
            (self.channels, self.h, 1),
        )
        t = jnp.arange(length) / length
        return w * jnp.exp(-jnp.abs(decay) * t)


class BlockFFT(nn.Module):
    """Learnable blocked-GEMM FFT, port of the reference's BlockFFT
    (examples/hyena/src/models/sequence/block_fft.py:115): the Monarch DFT
    factor matrices become parameters (optionally initialized to the exact
    DFT and optionally frozen), so the 'FFT' itself can be learned.

    __call__(x_re, x_im) computes the (possibly learned) transform of a
    (..., N) signal via two-factor blocked matmuls; learn_dft=False gives
    the exact FFT in Monarch layout.
    """

    n: int
    learn_dft: bool = True

    def setup(self):
        from flashfftconv_tpu.ops.plan import default_factors, make_plan

        factors = default_factors(self.n)
        if len(factors) != 2:
            # force a two-factor split for the blocked GEMM form
            m = self.n.bit_length() - 1
            factors = (1 << ((m + 1) // 2), 1 << (m // 2))
        self._plan = make_plan(self.n, compute_dtype=jnp.float32, factors=factors)
        if self.learn_dft:
            init = lambda arr: (lambda key, s: jnp.asarray(arr))
            self.f1_re = self.param("f1_re", init(self._plan.dft_re[0]),
                                    self._plan.dft_re[0].shape)
            self.f1_im = self.param("f1_im", init(self._plan.dft_im[0]),
                                    self._plan.dft_im[0].shape)
            self.f2_re = self.param("f2_re", init(self._plan.dft_re[1]),
                                    self._plan.dft_re[1].shape)
            self.f2_im = self.param("f2_im", init(self._plan.dft_im[1]),
                                    self._plan.dft_im[1].shape)

    def __call__(self, x_re, x_im=None):
        plan = self._plan
        f1, f2 = plan.factors
        batch = x_re.shape[:-1]
        xr = x_re.reshape(*batch, f1, f2).astype(jnp.float32)
        xi = None if x_im is None else x_im.reshape(*batch, f1, f2).astype(jnp.float32)
        if self.learn_dft:
            m1r, m1i, m2r, m2i = self.f1_re, self.f1_im, self.f2_re, self.f2_im
        else:
            m1r, m1i = plan.dft_re[0], plan.dft_im[0]
            m2r, m2i = plan.dft_re[1], plan.dft_im[1]

        def lmm(mre, mim, xr, xi):
            rr = jnp.einsum("kn,...nr->...kr", mre, xr)
            ri = jnp.einsum("kn,...nr->...kr", mim, xr)
            if xi is None:
                return rr, ri
            return rr - jnp.einsum("kn,...nr->...kr", mim, xi), ri + jnp.einsum(
                "kn,...nr->...kr", mre, xi
            )

        xr, xi = lmm(m1r, m1i, xr, xi)
        wr, wi = plan.tw_re[0], plan.tw_im[0]
        wr = wr.reshape(f1, f2)
        wi = wi.reshape(f1, f2)
        xr, xi = xr * wr - xi * wi, xr * wi + xi * wr
        rr = jnp.einsum("...kn,nm->...km", xr, m2r) - jnp.einsum(
            "...kn,nm->...km", xi, m2i
        )
        ri = jnp.einsum("...kn,nm->...km", xr, m2i) + jnp.einsum(
            "...kn,nm->...km", xi, m2r
        )
        return rr, ri
