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
    measure: str = "lin"  # "lin" | "inv" | "legs" (reference ssm/dplr.py
    # diag inits; "lin" reproduces the original S4D-Lin grid exactly)

    @nn.compact
    def __call__(self, length: int):
        n = self.n_state // 2
        w0 = dplr_diag_init(self.measure, self.n_state)  # (n,) complex

        def init_log_dt(key, shape):
            u = jax.random.uniform(key, shape)
            return u * (math.log(self.dt_max) - math.log(self.dt_min)) + math.log(
                self.dt_min
            )

        log_dt = self.param("log_dt", init_log_dt, (self.h,))
        log_a_re = self.param(
            "log_A_real",
            lambda key, s: jnp.broadcast_to(
                jnp.log(jnp.maximum(-jnp.asarray(w0.real, jnp.float32), 1e-4)), s
            ),
            (self.h, n),
        )
        a_im = self.param(
            "A_imag",
            lambda key, s: jnp.broadcast_to(
                jnp.asarray(w0.imag, jnp.float32), s
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


# --------------------------------------------------------------------------
# HiPPO / DPLR initializations (reference ssm/hippo.py + ssm/dplr.py) and the
# remaining SS kernels (ss_kernel_shift.py). These complete the reference's
# kernel-initialization zoo: S4D measures "lin"/"inv"/"legs" and the shift
# (FIR) SSM used by the original H3's k-projection (h3.py via ss_kernel.py
# mode='shift').
# --------------------------------------------------------------------------


def hippo_transition(measure: str, n: int) -> tuple[np.ndarray, np.ndarray]:
    """HiPPO (A, B) transition matrices (reference ssm/hippo.py transition):
    'legs' (scaled Legendre), 'legt' (translated Legendre), 'fourier'."""
    if measure == "legs":
        q = np.arange(n, dtype=np.float64)
        col, row = np.meshgrid(q, q)
        r = 2 * q + 1
        m = -(np.where(row >= col, r, 0) - np.diag(q))
        t = np.sqrt(np.diag(2 * q + 1))
        a = t @ m @ np.linalg.inv(t)
        b = np.diag(t)[:, None].copy()
    elif measure == "legt":
        q = np.arange(n, dtype=np.float64)
        r = (2 * q + 1) ** 0.5
        j, i = np.meshgrid(q, q)
        a = r[:, None] * np.where(i < j, (-1.0) ** (i - j), 1) * r[None, :]
        b = r[:, None].copy()
        a = -a
        # halve B, scale A down by 0.5 (the reference's legt normalization)
        b *= 0.5
        a *= 0.5
    elif measure == "fourier":
        freqs = np.arange(n // 2)
        d = np.stack([np.zeros(n // 2), freqs], axis=-1).reshape(-1)[1:]
        a = np.pi * (-np.diag(d, 1) + np.diag(d, -1))
        b = np.zeros(n)
        b[0::2] = 2**0.5
        b[0] = 1
        a = a - b[:, None] * b[None, :]
        b = b[:, None].copy()
    else:
        raise NotImplementedError(f"measure {measure!r}")
    return a.astype(np.float64), b.astype(np.float64)


def dplr_diag_init(measure: str, n: int) -> np.ndarray:
    """Complex diagonal eigenvalue grid for S4D variants (reference
    ssm/dplr.py): n//2 conjugate-pair representatives.

    'lin'  : -1/2 + i*pi*k                 (S4D-Lin)
    'inv'  : -1/2 + i*(N/pi)*(N/(2k+1)-1)  (S4D-Inv)
    'legs' : eigenvalues of the normal part of the HiPPO-LegS matrix
    """
    half = n // 2
    if measure == "lin":
        w = -0.5 + 1j * np.pi * np.arange(half)
    elif measure == "inv":
        k = np.arange(half)
        w = -0.5 + 1j * (n / np.pi) * (n / (2 * k + 1) - 1)
    elif measure == "legs":
        a, b = hippo_transition("legs", n)
        p = np.sqrt(np.arange(n, dtype=np.float64) + 0.5)  # rank-1 correction
        an = a + p[:, None] * p[None, :]  # normal part
        w_all = np.linalg.eigvals(an)
        w_all = w_all[np.argsort(w_all.imag)]
        w = w_all[w_all.imag > 0][:half]  # one representative per conj pair
        if len(w) < half:  # pad with the lin grid if the pairing is short
            w = np.concatenate([w, (-0.5 + 1j * np.pi * np.arange(half))[len(w):]])
    else:
        raise NotImplementedError(f"measure {measure!r}")
    return w.astype(np.complex128)


class SSKernelShift(nn.Module):
    """Shift SSM kernel (reference ssm/ss_kernel_shift.py + ss_kernel.py
    mode='shift'): B fixed to e_1 makes the kernel an N-tap learnable FIR,
    k = irfft(conj(rfft(B, 2N)) * rfft(C, 2N))[..., :N], zero-padded to L.
    C follows torch Conv1d's kaiming-uniform init."""

    h: int
    d_state: int = 64
    channels: int = 1

    @nn.compact
    def __call__(self, length: int):
        n = self.d_state

        def b_init(key, shape):
            return jnp.zeros(shape).at[..., 0].set(1.0)

        def c_init(key, shape):
            fan_in = self.channels * n  # torch kaiming_uniform(a=sqrt(5))
            bound = (1.0 / fan_in) ** 0.5
            return jax.random.uniform(key, shape, minval=-bound, maxval=bound)

        b = self.param("B", b_init, (self.h, n))
        c = self.param("C", c_init, (self.channels, self.h, n))
        b_f = jnp.fft.rfft(b, n=2 * n)
        c_f = jnp.fft.rfft(c, n=2 * n)
        k = jnp.fft.irfft(jnp.conj(b_f) * c_f, n=2 * n)[..., : min(n, length)]
        if n < length:
            k = jnp.pad(k, ((0, 0), (0, 0), (0, length - n)))
        return k
