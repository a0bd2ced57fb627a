"""Tests for partial / frequency-sparse convolutions vs the reference
semantics (/root/reference/flashfftconv/sparse_conv.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from flashfftconv_tpu import make_plan, partial_fft_conv, frequency_sparse_fft_conv


def _np_partial(x, k, n_partial):
    l = x.shape[-1]
    n = 2 * l
    x_f = np.fft.rfft(x, n=n)
    k_f = np.fft.rfft(k[..., :n_partial], n=n)
    return np.fft.irfft(x_f * k_f, n=n)[..., :l]


def test_partial_matches_oracle(rng):
    l, h, npart = 256, 4, 64
    x = rng.standard_normal((2, h, l)).astype(np.float32) * 0.02
    k = rng.standard_normal((h, l)).astype(np.float32) * 0.02
    y = partial_fft_conv(jnp.asarray(x), jnp.asarray(k), npart)
    np.testing.assert_allclose(np.asarray(y), _np_partial(x, k, npart), atol=1e-5)


def test_partial_via_monarch_plan(rng):
    """The optimized path: partial conv through the Monarch machinery
    (the capability the reference only sketches; SURVEY.md §5.7.3)."""
    l, h, npart = 256, 4, 32
    plan = make_plan(2 * l, compute_dtype=jnp.float32)
    x = rng.standard_normal((2, h, l)).astype(np.float32) * 0.02
    k = rng.standard_normal((h, l)).astype(np.float32) * 0.02
    y = partial_fft_conv(jnp.asarray(x), jnp.asarray(k), npart, plan=plan, impl="xla")
    np.testing.assert_allclose(np.asarray(y), _np_partial(x, k, npart), atol=1e-4)


def test_frequency_sparse(rng):
    l, h, npart = 128, 3, 64
    x = rng.standard_normal((2, h, l)).astype(np.float32) * 0.02
    k = rng.standard_normal((h, l)).astype(np.float32) * 0.02
    n = 2 * l
    x_f = np.fft.rfft(x, n=n)
    k_f = np.fft.rfft(k, n=n)
    k_f[..., npart // 2 :] = 0
    ref = np.fft.irfft(x_f * k_f, n=n)[..., :l]
    y = frequency_sparse_fft_conv(jnp.asarray(x), jnp.asarray(k), npart)
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)
