"""Parity tests for the fused Pallas kernels (interpret mode on CPU, compiled
on TPU) against the f32 jnp.fft oracle — forward and the custom-VJP backward,
for both the single-kernel (<=32K) and three-stage (>=64K) paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashfftconv_tpu.ops import monarch_pallas as mp
from flashfftconv_tpu.ops import plan as plan_mod
from flashfftconv_tpu.ops.monarch_xla import fft_conv_reference
from flashfftconv_tpu.ops.plan import make_plan


def _data(rng, b, h, length, gated=False):
    u = jnp.asarray(rng.standard_normal((b, h, length)).astype(np.float32) * 0.02)
    k = jnp.asarray(
        (rng.standard_normal((h, length)) * 0.02 * np.exp(-0.1 * np.arange(length))).astype(
            np.float32
        )
    )
    if not gated:
        return u, k
    pre = jnp.asarray(rng.standard_normal(u.shape).astype(np.float32) * 0.02)
    post = jnp.asarray(rng.standard_normal(u.shape).astype(np.float32) * 0.02)
    return u, k, pre, post


@pytest.mark.parametrize("seqlen", [2048, 8192, 32768, 65536])
@pytest.mark.parametrize("padded", [False, True])
def test_pallas_forward(rng, seqlen, padded):
    plan = make_plan(seqlen, compute_dtype=jnp.float32)
    assert mp.supported(plan)
    length = seqlen // 2 if padded else seqlen
    u, k = _data(rng, 2, 3, length)
    y = mp.fft_conv_pallas(plan, u, k)
    y_ref = fft_conv_reference(seqlen, u, k)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)


@pytest.mark.parametrize("seqlen", [4096, 65536])
@pytest.mark.parametrize("gated", [False, True])
def test_pallas_grads(rng, seqlen, gated):
    plan = make_plan(seqlen, compute_dtype=jnp.float32)
    length = seqlen // 2
    data = _data(rng, 2, 3, length, gated=gated)
    dout = jnp.asarray(rng.standard_normal(data[0].shape).astype(np.float32) * 0.02)
    argnums = tuple(range(len(data)))

    g = jax.grad(
        lambda *a: jnp.sum(mp.fft_conv_pallas(plan, *a) * dout), argnums=argnums
    )(*data)
    g_ref = jax.grad(
        lambda *a: jnp.sum(fft_conv_reference(seqlen, *a) * dout), argnums=argnums
    )(*data)
    names = ["u", "k", "pre", "post"][: len(data)]
    for n, a, b in zip(names, g, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, err_msg=f"d{n} at {seqlen}"
        )


def test_pallas_bf16_tolerance(rng):
    """bf16 compute hits the reference tolerance bar (1e-2)."""
    seqlen = 8192
    plan = make_plan(seqlen, compute_dtype=jnp.bfloat16)
    u, k = _data(rng, 2, 4, seqlen)
    u = u.astype(jnp.bfloat16)
    y = mp.fft_conv_pallas(plan, u, k)
    y_ref = fft_conv_reference(seqlen, u, k)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32), atol=1e-2
    )


def test_pallas_under_jit_and_dispatch(rng):
    """dispatch impl='pallas' path works under jit."""
    from flashfftconv_tpu.ops.dispatch import fft_conv

    seqlen = 4096
    plan = make_plan(seqlen, compute_dtype=jnp.float32)
    u, k = _data(rng, 2, 3, seqlen)
    y = jax.jit(lambda u, k: fft_conv(plan, u, k, impl="pallas"))(u, k)
    y_ref = fft_conv_reference(seqlen, u, k)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)


@pytest.mark.parametrize("gated", [False, True])
@pytest.mark.parametrize("padded", [False, True])
def test_fused_io_path(rng, gated, padded):
    """B even + H % 8 == 0 routes through the fully-fused I/O kernel
    (in-kernel relayout, padding and gating)."""
    seqlen = 2048
    plan = make_plan(seqlen, compute_dtype=jnp.float32)
    length = seqlen // 2 if padded else seqlen
    data = _data(rng, 4, 16, length, gated=gated)
    y = mp.fft_conv_pallas(plan, *data)
    y_ref = fft_conv_reference(seqlen, *data)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)

    dout = jnp.asarray(rng.standard_normal(data[0].shape).astype(np.float32) * 0.02)
    argnums = tuple(range(len(data)))
    g = jax.grad(lambda *a: jnp.sum(mp.fft_conv_pallas(plan, *a) * dout), argnums=argnums)(*data)
    g_ref = jax.grad(lambda *a: jnp.sum(fft_conv_reference(seqlen, *a) * dout), argnums=argnums)(*data)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("seqlen", [524288])
def test_pallas_4level_path(rng, seqlen):
    """The 4-level (Pallas butterfly + fused long inner) pipeline, fwd+bwd.
    Factors pinned to the 4-level shape: the default plan at this size is
    the fused 3-factor kernel whenever the VMEM budget allows."""
    plan = make_plan(seqlen, compute_dtype=jnp.float32, factors=(4, 4, 256, 128))
    assert len(plan.factors) == 4 and mp.supported(plan)
    length = seqlen // 2
    u, k = _data(rng, 2, 2, length)
    y = mp.fft_conv_pallas(plan, u, k)
    y_ref = fft_conv_reference(seqlen, u, k)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)

    dout = jnp.asarray(rng.standard_normal(u.shape).astype(np.float32) * 0.02)
    g = jax.grad(lambda *a: jnp.sum(mp.fft_conv_pallas(plan, *a) * dout), argnums=(0, 1))(u, k)
    g_ref = jax.grad(lambda *a: jnp.sum(fft_conv_reference(seqlen, *a) * dout), argnums=(0, 1))(u, k)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("gated", [False, True])
def test_direct_fused_io_path(rng, gated):
    """The <=1024 direct-DFT fused kernel (explicit single-factor plans;
    default plans are 2-factor from 256 up)."""
    seqlen = 512
    plan = make_plan(seqlen, compute_dtype=jnp.float32, factors=(seqlen,))
    assert len(plan.factors) == 1 and mp.supported(plan)
    data = _data(rng, 4, 16, seqlen, gated=gated)
    y = mp.fft_conv_pallas(plan, *data)
    y_ref = fft_conv_reference(seqlen, *data)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)

    dout = jnp.asarray(rng.standard_normal(data[0].shape).astype(np.float32) * 0.02)
    argnums = tuple(range(len(data)))
    g = jax.grad(lambda *a: jnp.sum(mp.fft_conv_pallas(plan, *a) * dout), argnums=argnums)(*data)
    g_ref = jax.grad(lambda *a: jnp.sum(fft_conv_reference(seqlen, *a) * dout), argnums=argnums)(*data)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("gated", [False, True])
def test_direct_fused_io_padded(rng, gated):
    """L < N on the direct-DFT kernel: the caller slices the DFT tables
    (x_pad @ C == x @ C[:L]) so the pad is never materialized; grads flow
    through the general-path backward."""
    seqlen = 512
    plan = make_plan(seqlen, compute_dtype=jnp.float32, factors=(seqlen,))
    data = _data(rng, 4, 16, seqlen // 2, gated=gated)
    y = mp.fft_conv_pallas(plan, *data)
    y_ref = fft_conv_reference(seqlen, *data)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)

    dout = jnp.asarray(rng.standard_normal(data[0].shape).astype(np.float32) * 0.02)
    argnums = tuple(range(len(data)))
    g = jax.grad(
        lambda *a: jnp.sum(mp.fft_conv_pallas(plan, *a) * dout), argnums=argnums
    )(*data)
    g_ref = jax.grad(
        lambda *a: jnp.sum(fft_conv_reference(seqlen, *a) * dout), argnums=argnums
    )(*data)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("gated", [False, True])
@pytest.mark.parametrize("padded", [False, True])
def test_direct_bwd_fused(rng, monkeypatch, gated, padded):
    """The fused direct-DFT backward (_direct_bwd_fused_io_tiles: du +
    gate grads + grid-accumulated dk_f in one pallas_call) is dispatched
    for qualifying 1-factor shapes and matches the oracle grads."""
    calls = []
    orig = mp._direct_bwd_fused_io_tiles

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(mp, "_direct_bwd_fused_io_tiles", spy)
    seqlen = 256
    plan = make_plan(seqlen, compute_dtype=jnp.float32, factors=(seqlen,))
    length = seqlen // 2 if padded else seqlen
    data = _data(rng, 4, 16, length, gated=gated)
    dout = jnp.asarray(
        rng.standard_normal(data[0].shape).astype(np.float32) * 0.02
    )
    argnums = tuple(range(len(data)))
    g = jax.grad(
        lambda *a: jnp.sum(mp.fft_conv_pallas(plan, *a) * dout), argnums=argnums
    )(*data)
    g_ref = jax.grad(
        lambda *a: jnp.sum(fft_conv_reference(seqlen, *a) * dout), argnums=argnums
    )(*data)
    assert calls, "fused direct backward was not dispatched"
    names = ["u", "k", "pre", "post"][: len(data)]
    for n, a, b in zip(names, g, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, err_msg=f"d{n}"
        )


def test_direct_padded_odd_length_fallback(rng):
    """L not a lane-tile multiple at single-factor sizes falls back to the
    XLA direct path (the kernel needs a 128-multiple MXU contraction)."""
    seqlen = 512
    plan = make_plan(seqlen, compute_dtype=jnp.float32, factors=(seqlen,))
    u, k = _data(rng, 4, 16, 300)
    y = mp.fft_conv_pallas(plan, u, k)
    y_ref = fft_conv_reference(seqlen, u, k)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)


@pytest.mark.parametrize("seqlen", [65536, 524288])
def test_long_dft_roundtrip(rng, seqlen):
    """_forward_long_dft / _inverse_long_dft (the >=64K spectrum + dk
    transforms) against the XLA Monarch DFT oracle, interpret mode."""
    from flashfftconv_tpu.ops import monarch_xla as mx

    plan = make_plan(seqlen, compute_dtype=jnp.float32)
    h = 2
    x = jnp.asarray(rng.standard_normal((h, seqlen)).astype(np.float32) * 0.02)
    fr, fi = mp._forward_long_dft(plan, x)
    rr, ri = mx.monarch_dft(plan, x.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(fr), np.asarray(rr), atol=1e-3)
    np.testing.assert_allclose(np.asarray(fi), np.asarray(ri), atol=1e-3)
    # inverse recovers the signal (real part)
    back = mp._inverse_long_dft(plan, fr, fi)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


@pytest.mark.parametrize("seqlen,b", [(65536, 1), (65536, 3), (524288, 1)])
@pytest.mark.parametrize("gated", [False, True])
def test_half_band_path(rng, seqlen, b, gated):
    """Odd/unit batch at >=64K takes the rfft half-band path (packing is
    unavailable): forward, padded forward, and full backward."""
    plan = make_plan(seqlen, compute_dtype=jnp.float32)
    assert mp._use_half(plan, jnp.zeros((b, 2, seqlen)))
    length = seqlen // 2
    data = _data(rng, b, 2, length, gated=gated)
    y = mp.fft_conv_pallas(plan, *data)
    y_ref = fft_conv_reference(seqlen, *data)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)

    dout = jnp.asarray(rng.standard_normal(data[0].shape).astype(np.float32) * 0.02)
    argnums = tuple(range(len(data)))
    g = jax.grad(lambda *a: jnp.sum(mp.fft_conv_pallas(plan, *a) * dout), argnums=argnums)(*data)
    g_ref = jax.grad(lambda *a: jnp.sum(fft_conv_reference(seqlen, *a) * dout), argnums=argnums)(*data)
    for a, b_ in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


@pytest.mark.parametrize("padded", [False, True])
def test_bwd_fused_io_gated(rng, padded):
    """The gate-fused 2-factor backward (_bwd_fused_io_tiles gated=True):
    raw u/pre/dout/post in, du/dpre/dpost out, vs the jnp.fft AD oracle.
    H=64 satisfies _h_tile so the fused-I/O kernel (not the layout
    fallback) is the path under test; padded keeps L % n2 == 0."""
    seqlen = 2048
    plan = make_plan(seqlen, compute_dtype=jnp.float32)
    assert mp._h_tile(*plan.factors, 64) is not None
    length = seqlen - plan.factors[1] if padded else seqlen
    data = _data(rng, 2, 64, length, gated=True)
    dout = jnp.asarray(rng.standard_normal(data[0].shape).astype(np.float32) * 0.02)
    argnums = tuple(range(4))
    g = jax.grad(lambda *a: jnp.sum(mp.fft_conv_pallas(plan, *a) * dout),
                 argnums=argnums)(*data)
    g_ref = jax.grad(lambda *a: jnp.sum(fft_conv_reference(seqlen, *a) * dout),
                     argnums=argnums)(*data)
    for n, a, b in zip(["u", "k", "pre", "post"], g, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, err_msg=f"d{n}"
        )


@pytest.mark.parametrize("gated", [False, True])
def test_long_mxu_outer_path(rng, gated):
    """The MXU-outer-DFT formulation inside the fused long kernel and its
    backward (taken when f0 >= 8): a small (8, 64, 128) plan keeps interpret
    mode fast while exercising the matmul outer stage, half-band tables,
    kf spectrum (_fwd_dft_tiles) and dk finish (_inv_dft_tiles) at f0=8."""
    seqlen = 65536
    plan = make_plan(seqlen, compute_dtype=jnp.float32, factors=(8, 64, 128))
    assert mp.supported(plan)
    length = seqlen // 2
    data = _data(rng, 2, 2, length, gated=gated)
    u, k = data[:2]
    pre, post = (data[2], data[3]) if gated else (None, None)
    y = mp.fft_conv_pallas(plan, *data)
    y_ref = fft_conv_reference(seqlen, *data)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)

    dout = jnp.asarray(rng.standard_normal(u.shape).astype(np.float32) * 0.02)
    g = dout if post is None else dout * post
    ug = u if pre is None else u * pre
    du, dk, dpre, dpost = mp._long_bwd_fused(plan, u, k, pre, post, dout, ug, g)
    argnums = tuple(range(len(data)))
    g_ref = jax.grad(
        lambda *a: jnp.sum(fft_conv_reference(seqlen, *a) * dout), argnums=argnums
    )(*data)
    got = [du, dk] + ([dpre, dpost] if gated else [])
    for n, a, b in zip(["u", "k", "pre", "post"][: len(data)], got, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, err_msg=f"d{n}"
        )


@pytest.mark.slow
def test_long_bign1_512k(rng):
    """The fused 3-factor kernel at a 512K (4, 512, 256) plan — the shape the
    default plan takes when the VMEM budget allows (plan._LONG3_CANDIDATES) —
    fwd + fused bwd against the jnp.fft oracle."""
    seqlen = 524288
    plan = make_plan(seqlen, compute_dtype=jnp.float32, factors=(4, 512, 256))
    length = seqlen // 2
    u, k = _data(rng, 1, 2, length)
    y = mp.fft_conv_pallas(plan, u, k)
    y_ref = fft_conv_reference(seqlen, u, k)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)

    dout = jnp.asarray(rng.standard_normal(u.shape).astype(np.float32) * 0.02)
    du, dk, _, _ = mp._long_bwd_fused(plan, u, k, None, None, dout, u, dout)
    g_ref = jax.grad(
        lambda *a: jnp.sum(fft_conv_reference(seqlen, *a) * dout), argnums=(0, 1)
    )(u, k)
    np.testing.assert_allclose(np.asarray(du), np.asarray(g_ref[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(g_ref[1]), atol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("gated", [False, True])
def test_big_2factor_path(rng, gated, monkeypatch):
    """The 2-factor kernels are factor-generic: 64K as a single (256, 256)
    fused-I/O kernel (no outer butterfly) through full dispatch, fwd + all
    grads. supported() does NOT admit these on TPU — the on-chip sweep
    found the gated compiles crash the remote compile helper
    (tpu_factor_sweep.json) — so the fused-seqlen cap is monkeypatched to
    route dispatch here in interpret mode, preserving kernel generality
    for a future toolchain."""
    monkeypatch.setattr(mp, "MAX_FUSED_SEQLEN", 65536)
    seqlen = 65536
    plan = make_plan(seqlen, compute_dtype=jnp.float32, factors=(256, 256))
    assert mp.supported(plan)
    length = seqlen // 2 if gated else seqlen
    data = _data(rng, 2, 2, length, gated=gated)
    y = mp.fft_conv_pallas(plan, *data)
    y_ref = fft_conv_reference(seqlen, *data)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)

    dout = jnp.asarray(rng.standard_normal(data[0].shape).astype(np.float32) * 0.02)
    argnums = tuple(range(len(data)))
    g = jax.grad(lambda *a: jnp.sum(mp.fft_conv_pallas(plan, *a) * dout),
                 argnums=argnums)(*data)
    g_ref = jax.grad(lambda *a: jnp.sum(fft_conv_reference(seqlen, *a) * dout),
                     argnums=argnums)(*data)
    for n, a, b in zip(["u", "k", "pre", "post"], g, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, err_msg=f"d{n}"
        )


@pytest.mark.slow
def test_fat_4factor_path(rng, monkeypatch):
    """A budget-gated fat 4-factor pipeline — 1M as butterfly(2) + one
    512K complex inner (inner f0*n1*n2 past the old 256K cap) — through
    full dispatch: gated fwd + all four grads vs the jnp.fft oracle."""
    monkeypatch.setattr(plan_mod, "VMEM_BUDGET_MB", 100)
    seqlen = 1048576
    plan = make_plan(seqlen, compute_dtype=jnp.float32, factors=(2, 8, 512, 128))
    assert mp.supported(plan)
    data = _data(rng, 1, 2, seqlen // 2, gated=True)
    y = mp.fft_conv_pallas(plan, *data)
    y_ref = fft_conv_reference(seqlen, *data)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)

    dout = jnp.asarray(rng.standard_normal(data[0].shape).astype(np.float32) * 0.02)
    argnums = tuple(range(4))
    g = jax.grad(lambda *a: jnp.sum(mp.fft_conv_pallas(plan, *a) * dout),
                 argnums=argnums)(*data)
    g_ref = jax.grad(lambda *a: jnp.sum(fft_conv_reference(seqlen, *a) * dout),
                     argnums=argnums)(*data)
    for n, a, b in zip(["u", "k", "pre", "post"], g, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, err_msg=f"d{n}"
        )


def test_bwd_plan_override(rng, monkeypatch):
    """FLASHFFTCONV_BWD_FACTORS decouples the backward's factorization from
    the forward plan's (the fused backward's live VMEM set is ~2x the
    forward's, so the fwd-optimal shape can be past the bwd sweet spot).
    Selection logic + gradient correctness under a different-factor plan."""
    seqlen = 65536
    plan = make_plan(seqlen, compute_dtype=jnp.float32)  # (4, 128, 128)

    # no override -> same plan
    assert mp._bwd_plan(plan) is plan
    # env override -> different, supported plan of the same seqlen
    monkeypatch.setenv("FLASHFFTCONV_BWD_FACTORS", "65536:2,256,128")
    bplan = mp._bwd_plan(plan)
    assert bplan.factors == (2, 256, 128) and bplan.seqlen == seqlen
    # unsupported override (factors don't multiply to N) is rejected by
    # make_plan; a wrong-seqlen key is ignored
    monkeypatch.setenv("FLASHFFTCONV_BWD_FACTORS", "131072:2,512,128")
    assert mp._bwd_plan(plan) is plan

    # grads under the override plan (computed the way the TPU dispatch
    # would: _long_bwd_fused on bplan while the forward ran on plan)
    length = seqlen // 2
    data = _data(rng, 2, 2, length, gated=True)
    u, k, pre, post = data
    dout = jnp.asarray(rng.standard_normal(u.shape).astype(np.float32) * 0.02)
    bplan = make_plan(seqlen, compute_dtype=jnp.float32, factors=(2, 256, 128))
    du, dk, dpre, dpost = mp._long_bwd_fused(
        bplan, u, k, pre, post, dout, u * pre, dout * post
    )
    g_ref = jax.grad(
        lambda *a: jnp.sum(fft_conv_reference(seqlen, *a) * dout),
        argnums=(0, 1, 2, 3),
    )(*data)
    for n, a, b in zip(["u", "k", "pre", "post"], [du, dk, dpre, dpost], g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, err_msg=f"d{n}"
        )


@pytest.mark.slow
@pytest.mark.parametrize("gated", [False, True])
@pytest.mark.parametrize("padded", [False, True])
def test_long_bwd_fused(rng, gated, padded):
    """The fully-fused 3-factor backward kernel (_long_bwd_fused: du + y +
    grid-accumulated dk_f in one pallas_call) against the jnp.fft AD oracle.
    On CPU the default dispatch keeps the separate-transform path, so this
    calls the fused implementation directly (interpret mode)."""
    seqlen = 65536
    plan = make_plan(seqlen, compute_dtype=jnp.float32)
    length = seqlen // 2 if padded else seqlen
    data = _data(rng, 2, 2, length, gated=gated)
    u, k = data[:2]
    pre, post = (data[2], data[3]) if gated else (None, None)
    dout = jnp.asarray(rng.standard_normal(u.shape).astype(np.float32) * 0.02)

    g = dout if post is None else dout * post
    ug = u if pre is None else u * pre
    du, dk, dpre, dpost = mp._long_bwd_fused(plan, u, k, pre, post, dout, ug, g)

    argnums = tuple(range(len(data)))
    g_ref = jax.grad(
        lambda *a: jnp.sum(fft_conv_reference(seqlen, *a) * dout), argnums=argnums
    )(*data)
    got = [du, dk] + ([dpre, dpost] if gated else [])
    names = ["u", "k", "pre", "post"][: len(data)]
    for n, a, b in zip(names, got, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, err_msg=f"d{n}"
        )


@pytest.mark.slow
@pytest.mark.parametrize("gated,padded", [(False, True), (True, False), (True, True)])
def test_long4_bwd_fused(rng, gated, padded):
    """The 4-factor fused backward (_long4_bwd_fused: outer butterflies +
    fused complex inner kernel + inverse butterflies) against the jnp.fft
    AD oracle. On CPU the default dispatch keeps the separate-transform
    path, so this calls the fused implementation directly (interpret)."""
    seqlen = 524288
    plan = make_plan(seqlen, compute_dtype=jnp.float32, factors=(4, 4, 256, 128))
    assert len(plan.factors) == 4
    length = seqlen // 2 if padded else seqlen
    data = _data(rng, 2, 2, length, gated=gated)
    u, k = data[:2]
    pre, post = (data[2], data[3]) if gated else (None, None)
    dout = jnp.asarray(rng.standard_normal(u.shape).astype(np.float32) * 0.02)

    g = dout if post is None else dout * post
    ug = u if pre is None else u * pre
    du, dk, dpre, dpost = mp._long4_bwd_fused(plan, u, k, pre, post, dout, ug, g)

    argnums = tuple(range(len(data)))
    g_ref = jax.grad(
        lambda *a: jnp.sum(fft_conv_reference(seqlen, *a) * dout), argnums=argnums
    )(*data)
    got = [du, dk] + ([dpre, dpost] if gated else [])
    names = ["u", "k", "pre", "post"][: len(data)]
    for n, a, b in zip(names, got, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, err_msg=f"d{n}"
        )


@pytest.mark.parametrize("gated", [False, True])
def test_long_fori_band_loop(rng, gated, monkeypatch):
    """The lax.fori_loop band path (taken when bands*n1 >= _BAND_FORI_ROWS —
    the 2M/4M single-pass shapes whose unrolled compiles crash the remote
    helper): threshold forced to 0 so a small (8, 64, 128) plan runs the
    loop variant; fwd + fused bwd must match the oracle exactly like the
    unrolled path (test_long_mxu_outer_path)."""
    monkeypatch.setattr(mp, "_BAND_FORI_ROWS", 1)
    seqlen = 65536
    plan = make_plan(seqlen, compute_dtype=jnp.float32, factors=(8, 64, 128))
    assert mp._fori_bands(plan.factors[0], plan.factors[1], 5)
    length = seqlen // 2
    data = _data(rng, 2, 2, length, gated=gated)
    u, k = data[:2]
    pre, post = (data[2], data[3]) if gated else (None, None)
    y = mp.fft_conv_pallas(plan, *data)
    y_ref = fft_conv_reference(seqlen, *data)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)

    dout = jnp.asarray(rng.standard_normal(u.shape).astype(np.float32) * 0.02)
    g = dout if post is None else dout * post
    ug = u if pre is None else u * pre
    du, dk, dpre, dpost = mp._long_bwd_fused(plan, u, k, pre, post, dout, ug, g)
    argnums = tuple(range(len(data)))
    g_ref = jax.grad(
        lambda *a: jnp.sum(fft_conv_reference(seqlen, *a) * dout), argnums=argnums
    )(*data)
    got = [du, dk] + ([dpre, dpost] if gated else [])
    for n, a, b in zip(["u", "k", "pre", "post"][: len(data)], got, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, err_msg=f"d{n}"
        )


def test_long4_fori_band_loop(rng, monkeypatch):
    """fori band path through the 4-factor pipeline's complex inner stage
    (full-band tables, complex I/O rows)."""
    monkeypatch.setattr(mp, "_BAND_FORI_ROWS", 1)
    seqlen = 1048576
    plan = make_plan(seqlen, compute_dtype=jnp.float32, factors=(4, 8, 128, 256))
    length = seqlen // 2
    u, k = _data(rng, 1, 2, length)
    y = mp.fft_conv_pallas(plan, u, k)
    y_ref = fft_conv_reference(seqlen, u, k)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)

    dout = jnp.asarray(rng.standard_normal(u.shape).astype(np.float32) * 0.02)
    du, dk, _, _ = mp._long4_bwd_fused(plan, u, k, None, None, dout, u, dout)
    g_ref = jax.grad(
        lambda *a: jnp.sum(fft_conv_reference(seqlen, *a) * dout), argnums=(0, 1)
    )(u, k)
    np.testing.assert_allclose(np.asarray(du), np.asarray(g_ref[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(g_ref[1]), atol=1e-4)
