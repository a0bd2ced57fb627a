"""Pure-XLA Monarch FFT convolution (planar complex, MXU-friendly einsums).

This is the reference-quality, fully differentiable implementation of the
Monarch-decomposed FFT convolution: every stage is a batched matmul
(``jnp.einsum`` with ``preferred_element_type=f32``) against the plan's
precomputed DFT matrices plus an elementwise twiddle multiply, so XLA maps the
whole chain onto the MXU. Complex arithmetic is planar (separate real/imag
arrays) because the MXU has no complex type; twiddle multiplies happen in f32.

It covers every seqlen 256..4M with one code path (the reference needs 13
hand-written CUDA dispatch branches; /root/reference/flashfftconv/conv.py:566-1733)
and serves as (a) the fallback path for any shape, (b) the correctness oracle
for the fused Pallas kernels, and (c) the building block for the >=64K
three-stage pipeline.
"""

from __future__ import annotations

import math


import jax
import jax.numpy as jnp

from flashfftconv_tpu.ops.plan import FftPlan


def _stage_matmul(fre, fim, xre, xim, axis_from_end, compute_dtype):
    """Apply the complex matrix F (f, f) along the axis `axis_from_end` of x.

    x has shape (..., f_j, R_trailing...) where the target axis is
    ``-axis_from_end``. Returns (re, im) with f32 accumulation. When xim is
    None the input is treated as real (first forward stage), saving half the
    matmuls.
    """
    c = lambda a: a.astype(compute_dtype)
    # Build einsum spec: contract F[k, n] with x[..., n, ...trailing].
    nd = xre.ndim
    ax = nd - axis_from_end
    letters = "abcdefghijklmnopqrstuvwxyz"
    x_spec = letters[:nd]
    n_l = x_spec[ax]
    k_l = "Z"
    out_spec = x_spec[:ax] + k_l + x_spec[ax + 1 :]
    spec = f"{k_l}{n_l},{x_spec}->{out_spec}"

    def mm(m, v):
        return jnp.einsum(spec, c(m), c(v), preferred_element_type=jnp.float32)

    if xim is None:
        return mm(fre, xre), mm(fim, xre)
    rr = mm(fre, xre) - mm(fim, xim)
    ii = mm(fre, xim) + mm(fim, xre)
    return rr, ii


def _twiddle_mul(wre, wim, xre, xim, stage, factors, conj=False):
    """Multiply x (..., f1..fj.., R reshaped as trailing factor axes) by the
    stage-`stage` twiddle (f_j, R_j), broadcast over batch and earlier factors."""
    m = len(factors)
    # Trailing axes of x after `stage` are (f_{stage+1}, ..., f_m); the twiddle
    # is (f_stage, R_stage) with R_stage = prod of those, so reshape it to
    # (f_stage, f_{stage+1}, ..., f_m) and broadcast.
    shape = (factors[stage],) + tuple(factors[stage + 1 :])
    wre = wre.reshape(shape)
    wim = wim.reshape(shape)
    if conj:
        wim = -wim
    rr = xre * wre - xim * wim
    ii = xre * wim + xim * wre
    return rr, ii


def monarch_dft(plan: FftPlan, xre, xim=None, compute_dtype=None):
    """Forward Monarch DFT: (..., N) real or planar-complex -> planar (..., f1, ..., fm).

    Output layout: X[..., k1, ..., km] = FFT(x)[k1 + f1*k2 + f1*f2*k3 + ...].
    """
    factors = plan.factors
    dtype = compute_dtype or plan.compute_dtype
    m = len(factors)
    batch = xre.shape[:-1]
    xre = xre.reshape(*batch, *factors)
    if xim is not None:
        xim = xim.reshape(*batch, *factors)
    for j in range(m):
        axis_from_end = m - j
        xre, xim = _stage_matmul(
            plan.dft_re[j], plan.dft_im[j], xre, xim, axis_from_end, dtype
        )
        if j < m - 1:
            xre, xim = _twiddle_mul(plan.tw_re[j], plan.tw_im[j], xre, xim, j, factors)
    return xre, xim


def monarch_idft(plan: FftPlan, xre, xim, compute_dtype=None):
    """Inverse Monarch DFT: planar (..., f1, ..., fm) -> planar (..., N).

    Carries the 1/N normalization (folded into the stage-0 inverse matrix).
    """
    factors = plan.factors
    dtype = compute_dtype or plan.compute_dtype
    m = len(factors)
    for j in range(m - 1, -1, -1):
        if j < m - 1:
            xre, xim = _twiddle_mul(
                plan.tw_re[j], plan.tw_im[j], xre, xim, j, factors, conj=True
            )
        axis_from_end = m - j
        xre, xim = _stage_matmul(
            plan.idft_re[j], plan.idft_im[j], xre, xim, axis_from_end, dtype
        )
    batch = xre.shape[: -m]
    n = math.prod(factors)
    return xre.reshape(*batch, n), xim.reshape(*batch, n)


def kernel_spectrum(plan: FftPlan, k: jax.Array):
    """FFT of the (real, possibly shorter-than-N) conv kernel, in Monarch layout.

    The reference computes this with cuFFT in fp32
    (/root/reference/flashfftconv/conv.py:573-575) then permutes. Here the
    spectrum is computed directly in Monarch layout via the f32 Monarch DFT
    itself — XLA's native FFT op is pathologically slow on TPU (measured
    ~3.3s for a (384, 64K) transform on v5e), while the Monarch matmuls take
    microseconds and are accurate to f32 roundoff (tests/test_plan.py).
    Returns planar (kf_re, kf_im), each (..., f1, ..., fm), f32.
    """
    n = plan.seqlen
    k = k.astype(jnp.float32)
    if k.shape[-1] < n:
        k = jnp.pad(k, [(0, 0)] * (k.ndim - 1) + [(0, n - k.shape[-1])])
    # Plan compute dtype (f32 accumulation): matches the precision at which
    # u's spectrum is computed in the kernels, and the reference's own k_f
    # cast to fp16/bf16 after cuFFT (conv.py:585). f32 operands here would
    # cost ~10x (measured 28ms at H=96, N=1M on v5e).
    return monarch_dft(plan, k)


def fft_conv_xla(
    plan: FftPlan,
    u: jax.Array,
    k: jax.Array,
    pregate: jax.Array | None = None,
    postgate: jax.Array | None = None,
) -> jax.Array:
    """Monarch FFT convolution, pure-XLA path. Fully differentiable.

    Computes ``out = postgate * ifft(fft(pre * u, N) * fft(k, N)).real[..., :L]``
    (circular convolution at size N = plan.seqlen with implicit zero padding
    when L < N), matching the reference semantics
    (/root/reference/tests/test_flashfftconv.py:5-13, 208-209).

    Args:
      u: (..., H, L) real input, L <= N.
      k: (H, k_len) real kernel, k_len <= N.
      pregate/postgate: optional (..., H, L) gates.
    """
    n = plan.seqlen
    length = u.shape[-1]
    if length > n:
        raise ValueError(f"input length {length} > plan seqlen {n}")
    out_dtype = u.dtype

    if pregate is not None:
        u = u * pregate
    ure = u.astype(jnp.float32)
    if length < n:
        pad = [(0, 0)] * (u.ndim - 1) + [(0, n - length)]
        ure = jnp.pad(ure, pad)

    kf_re, kf_im = kernel_spectrum(plan, k)

    xre, xim = monarch_dft(plan, ure)
    # Frequency-domain depthwise multiply: kf broadcasts over batch dims.
    yre = xre * kf_re - xim * kf_im
    yim = xre * kf_im + xim * kf_re
    ore, _ = monarch_idft(plan, yre, yim)

    out = ore[..., :length]
    if postgate is not None:
        out = out * postgate.astype(jnp.float32)
    return out.astype(out_dtype)


def fft_conv_reference(
    seqlen: int,
    u: jax.Array,
    k: jax.Array,
    pregate: jax.Array | None = None,
    postgate: jax.Array | None = None,
) -> jax.Array:
    """f32 jnp.fft oracle, mirroring the reference test oracle
    (/root/reference/tests/test_flashfftconv.py:5-13)."""
    length = u.shape[-1]
    if pregate is not None:
        u = u * pregate
    u_f = jnp.fft.fft(u.astype(jnp.float32), n=seqlen, axis=-1)
    k_f = jnp.fft.fft(k.astype(jnp.float32), n=seqlen, axis=-1)
    out = jnp.fft.ifft(u_f * k_f, n=seqlen, axis=-1).real[..., :length]
    if postgate is not None:
        out = out * postgate.astype(jnp.float32)
    return out.astype(u.dtype)
