"""Unit tests for FFT plan construction and the Monarch transform algebra."""

import jax.numpy as jnp
import numpy as np
import pytest

from flashfftconv_tpu.ops.monarch_xla import monarch_dft, monarch_idft
from flashfftconv_tpu.ops.plan import (
    default_factors,
    is_supported_seqlen,
    kf_permute,
    kf_unpermute,
    make_plan,
)

ALL_SIZES = [1 << m for m in range(8, 23)]  # 256 .. 4M


def test_default_factors_cover_all_sizes():
    for n in ALL_SIZES:
        fs = default_factors(n)
        assert np.prod(fs) == n
        # Single-factor plans are the direct-DFT path; multi-factor stages
        # keep every factor small enough for VMEM-resident tables.
        assert len(fs) == 1 or all(f <= 256 for f in fs[-2:])
        assert is_supported_seqlen(n)


@pytest.mark.parametrize("bad", [8, 255, 300, 8 * 1024 * 1024])
def test_unsupported_sizes_raise(bad):
    with pytest.raises(ValueError):
        default_factors(bad)


@pytest.mark.parametrize("n", [256, 512, 1024, 2048, 4096, 16384, 65536])
def test_monarch_dft_matches_fft(rng, n):
    plan = make_plan(n, compute_dtype=jnp.float32)
    x = rng.standard_normal((2, 3, n)).astype(np.float32)
    xre, xim = monarch_dft(plan, jnp.asarray(x))
    got = np.asarray(kf_unpermute(xre + 1j * xim, plan.factors))
    ref = np.fft.fft(x)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got / scale, ref / scale, atol=3e-6)


@pytest.mark.parametrize("n", [256, 2048, 32768, 131072])
def test_monarch_roundtrip(rng, n):
    plan = make_plan(n, compute_dtype=jnp.float32)
    x = rng.standard_normal((1, 2, n)).astype(np.float32)
    xre, xim = monarch_dft(plan, jnp.asarray(x))
    rre, rim = monarch_idft(plan, xre, xim)
    np.testing.assert_allclose(np.asarray(rre), x, atol=2e-5)
    np.testing.assert_allclose(np.asarray(rim), 0.0, atol=2e-5)


def test_kf_permute_roundtrip(rng):
    factors = (4, 8, 16)
    n = 512
    x = rng.standard_normal((3, n)).astype(np.float32)
    p = kf_permute(jnp.asarray(x), factors)
    assert p.shape == (3, 4, 8, 16)
    back = kf_unpermute(p, factors)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_custom_factors(rng):
    n = 4096
    plan = make_plan(n, compute_dtype=jnp.float32, factors=(16, 16, 16))
    x = rng.standard_normal((2, n)).astype(np.float32)
    xre, xim = monarch_dft(plan, jnp.asarray(x))
    got = np.asarray(kf_unpermute(xre + 1j * xim, plan.factors))
    ref = np.fft.fft(x)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got / scale, ref / scale, atol=3e-6)


def test_default_factors_budget(monkeypatch):
    """>=512K factor choice follows the VMEM budget: the 4-level pipeline
    under Mosaic's 16 MB default, the single-pass fused 3-factor shapes
    once the budget clears each candidate's unpacked+gated estimate."""
    from flashfftconv_tpu.ops import plan as plan_mod

    monkeypatch.setattr(plan_mod, "VMEM_BUDGET_MB", 16)
    assert plan_mod.default_factors(524288) == (4, 4, 256, 128)
    assert plan_mod.default_factors(1048576) == (8, 4, 256, 128)
    monkeypatch.setattr(plan_mod, "VMEM_BUDGET_MB", 48)
    assert plan_mod.default_factors(524288) == (8, 512, 128)
    assert plan_mod.default_factors(1048576) == (8, 512, 256)
    monkeypatch.setattr(plan_mod, "VMEM_BUDGET_MB", 100)
    # Round-5 flips at the full budget: 1M prefers (16,512,128) and 2M the
    # single-pass (32,256,256) (fori band loop made both compile-sane;
    # parity 67/67 at these defaults). 4M keeps the pipeline.
    assert plan_mod.default_factors(1048576) == (16, 512, 128)
    assert plan_mod.default_factors(2097152) == (32, 256, 256)
    assert plan_mod.default_factors(4194304) == (32, 4, 256, 128)


def test_use_half_budget_forcing(monkeypatch):
    """Even-batch inputs on big-tile 3-factor plans drop to half-band
    unpacked when the packed working set would exceed the budget."""
    from flashfftconv_tpu.ops import plan as plan_mod
    from flashfftconv_tpu.ops import monarch_pallas as mp

    plan = make_plan(1048576, compute_dtype=jnp.bfloat16, factors=(8, 512, 256))
    x = jnp.zeros((2, 1, 1048576), jnp.bfloat16)
    monkeypatch.setattr(plan_mod, "VMEM_BUDGET_MB", 64)
    assert mp.supported(plan)           # unpacked+gated ~48 MB fits
    assert mp._use_half(plan, x)        # packed+gated ~77 MB does not
    monkeypatch.setattr(plan_mod, "VMEM_BUDGET_MB", 100)
    assert not mp._use_half(plan, x)    # packed fits again


def test_default_factors_env_override(monkeypatch):
    """FLASHFFTCONV_FACTORS overrides the default plan per size (A/B lever);
    bad products raise with the env var named."""
    import pytest as _pytest

    from flashfftconv_tpu.ops.plan import default_factors

    monkeypatch.setenv("FLASHFFTCONV_FACTORS", "2048:8,256;4096:16,16,16")
    assert default_factors(2048) == (8, 256)
    assert default_factors(4096) == (16, 16, 16)
    assert default_factors(1024) == (8, 128)  # untouched size
    monkeypatch.setenv("FLASHFFTCONV_FACTORS", "2048:8,8")
    with _pytest.raises(ValueError, match="FLASHFFTCONV_FACTORS"):
        default_factors(2048)
