"""Parity tests for the short depthwise conv1d, mirroring
/root/reference/tests/test_conv1d.py: BHL and BLH layouts, odd kernel sizes,
mixed input/weight dtypes, forward and gradients vs a lax.conv reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashfftconv_tpu import FlashDepthWiseConv1d, depthwise_conv1d


def _ref_conv1d(x_bhl, w_dk, bias, padding):
    """Oracle: lax.conv_general_dilated with feature_group_count=D (f32)."""
    d, k = w_dk.shape
    out = jax.lax.conv_general_dilated(
        x_bhl.astype(jnp.float32),
        w_dk[:, None, :].astype(jnp.float32),  # (O=D, I/g=1, K)
        window_strides=(1,),
        padding=[(padding, padding)],
        feature_group_count=d,
        dimension_numbers=("NCH", "OIH", "NCH"),
        # True f32 multiplies: TPU's DEFAULT conv precision truncates f32
        # operands to bf16 passes, which would make the ORACLE the sloppy
        # side (observed: ~3e-1 abs error vs the exact-f32 Pallas kernels).
        precision=jax.lax.Precision.HIGHEST,
    )
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None, :, None]
    return out


@pytest.mark.parametrize("b,d,l", [(2, 8, 64), (1, 3, 100), (4, 16, 128)])
@pytest.mark.parametrize("k", [3, 5, 7])
def test_bhl_forward(rng, b, d, l, k):
    x = jnp.asarray(rng.standard_normal((b, d, l)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((d, k)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((d,)).astype(np.float32))
    pad = (k - 1) // 2
    y = depthwise_conv1d(x, w, bias, padding=pad, is_bhl=True)
    y_ref = _ref_conv1d(x, w, bias, pad)
    assert y.shape == (b, d, l)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)


@pytest.mark.parametrize("k", [3, 5])
@pytest.mark.parametrize("pad", [0, 1, 2])
def test_blh_forward(rng, k, pad):
    b, d, l = 2, 6, 50
    x = jnp.asarray(rng.standard_normal((b, l, d)).astype(np.float32))
    w_kd = jnp.asarray(rng.standard_normal((k, d)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((d,)).astype(np.float32))
    y = depthwise_conv1d(x, w_kd, bias, padding=pad, is_bhl=False)
    y_ref = _ref_conv1d(jnp.swapaxes(x, 1, 2), w_kd.T, bias, pad)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(jnp.swapaxes(y_ref, 1, 2)), atol=1e-5
    )


@pytest.mark.parametrize(
    "x_dtype,w_dtype",
    [
        (jnp.float32, jnp.float32),
        (jnp.bfloat16, jnp.float32),  # mixed precision: fp32 master weights
        (jnp.bfloat16, jnp.bfloat16),
        (jnp.float16, jnp.float16),
    ],
)
def test_mixed_dtypes(rng, x_dtype, w_dtype):
    b, d, l, k = 2, 8, 64, 5
    x = jnp.asarray(rng.standard_normal((b, d, l)).astype(np.float32)).astype(x_dtype)
    w = jnp.asarray(rng.standard_normal((d, k)).astype(np.float32)).astype(w_dtype)
    bias = jnp.asarray(rng.standard_normal((d,)).astype(np.float32)).astype(w_dtype)
    y = depthwise_conv1d(x, w, bias, padding=2, is_bhl=True)
    assert y.dtype == x_dtype
    y_ref = _ref_conv1d(x, w, bias, 2)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32), atol=1e-1
    )


def test_backward(rng):
    b, d, l, k = 2, 8, 64, 3
    x = jnp.asarray(rng.standard_normal((b, d, l)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((d, k)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((d,)).astype(np.float32))

    def loss_mine(x, w, bias):
        return jnp.sum(depthwise_conv1d(x, w, bias, padding=1, is_bhl=True) ** 2)

    def loss_ref(x, w, bias):
        return jnp.sum(_ref_conv1d(x, w, bias, 1) ** 2)

    g = jax.grad(loss_mine, argnums=(0, 1, 2))(x, w, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, bias)
    for a, b_ in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-3)


@pytest.mark.parametrize("is_bhl", [True, False])
@pytest.mark.parametrize("pad", [(2, 0), 1, (0, 2)])
def test_shifts_impl_matches_xla(rng, is_bhl, pad):
    """impl='shifts' (tap-loop, no conv op) must match the grouped-conv XLA
    path exactly — forward and all three grads."""
    b, d, l, k = 2, 8, 64, 3
    shape = (b, d, l) if is_bhl else (b, l, d)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((d, k) if is_bhl else (k, d)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((d,)).astype(np.float32))

    def loss(impl):
        return lambda x, w, bias: jnp.sum(
            depthwise_conv1d(x, w, bias, padding=pad, is_bhl=is_bhl, impl=impl) ** 2
        )

    np.testing.assert_allclose(
        np.asarray(depthwise_conv1d(x, w, bias, padding=pad, is_bhl=is_bhl,
                                    impl="shifts")),
        np.asarray(depthwise_conv1d(x, w, bias, padding=pad, is_bhl=is_bhl,
                                    impl="xla")),
        atol=1e-5,
    )
    g_s = jax.grad(loss("shifts"), argnums=(0, 1, 2))(x, w, bias)
    g_x = jax.grad(loss("xla"), argnums=(0, 1, 2))(x, w, bias)
    for a, b_ in zip(g_s, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-3)


def test_even_kernel_raises(rng):
    x = jnp.ones((1, 4, 16))
    w = jnp.ones((4, 4))
    with pytest.raises(ValueError):
        depthwise_conv1d(x, w, None, padding=1)


def test_module(rng):
    d, k = 8, 5
    w = jnp.asarray(rng.standard_normal((d, k)).astype(np.float32))
    bias = jnp.zeros((d,))
    mod = FlashDepthWiseConv1d(d, k, padding=2, weights=w, bias=bias, is_bhl=True)
    x = jnp.asarray(rng.standard_normal((2, d, 32)).astype(np.float32))
    y = mod(x)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(_ref_conv1d(x, w, bias, 2)), atol=1e-5
    )


@pytest.mark.parametrize("is_bhl", [True, False])
@pytest.mark.parametrize("k,pad", [(3, 1), (5, 2), (7, 3), (3, 0)])
def test_pallas_path_forward(rng, is_bhl, k, pad):
    """D % 128 == 0 routes through the fused Pallas kernel."""
    b, d, l = 2, 128, 256
    w_dk = jnp.asarray(rng.standard_normal((d, k)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((d,)).astype(np.float32))
    if is_bhl:
        x = jnp.asarray(rng.standard_normal((b, d, l)).astype(np.float32))
        y = depthwise_conv1d(x, w_dk, bias, padding=pad, is_bhl=True)
        y_ref = _ref_conv1d(x, w_dk, bias, pad)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)
    else:
        x = jnp.asarray(rng.standard_normal((b, l, d)).astype(np.float32))
        y = depthwise_conv1d(x, w_dk.T, bias, padding=pad, is_bhl=False)
        y_ref = _ref_conv1d(jnp.swapaxes(x, 1, 2), w_dk, bias, pad)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(jnp.swapaxes(y_ref, 1, 2)), atol=1e-4
        )


@pytest.mark.parametrize("is_bhl", [True, False])
def test_pallas_path_grads(rng, monkeypatch, is_bhl):
    """FLASHFFTCONV_DW_BWD=fused keeps the Pallas forward under
    differentiation and routes the backward through the fused one-pass
    kernel (the default mode is the pure-XLA floor; see _bwd_mode)."""
    monkeypatch.setenv("FLASHFFTCONV_DW_BWD", "fused")
    b, d, l, k, pad = 2, 128, 64, 5, 2
    w_dk = jnp.asarray(rng.standard_normal((d, k)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((d,)).astype(np.float32))
    if is_bhl:
        x = jnp.asarray(rng.standard_normal((b, d, l)).astype(np.float32))
        w = w_dk
    else:
        x = jnp.asarray(rng.standard_normal((b, l, d)).astype(np.float32))
        w = w_dk.T

    def loss_mine(x, w, bias):
        return jnp.sum(depthwise_conv1d(x, w, bias, padding=pad, is_bhl=is_bhl) ** 2)

    def loss_ref(x, w, bias):
        xb = x if is_bhl else jnp.swapaxes(x, 1, 2)
        wd = w if is_bhl else w.T
        y = _ref_conv1d(xb, wd, bias, pad)
        return jnp.sum(y**2)

    g = jax.grad(loss_mine, argnums=(0, 1, 2))(x, w, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, bias)
    for name, a, b_ in zip(["dx", "dw", "dbias"], g, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=1e-3, err_msg=f"{name} is_bhl={is_bhl}"
        )


def test_pallas_path_bf16(rng):
    b, d, l, k = 2, 256, 128, 3
    x = jnp.asarray(rng.standard_normal((b, d, l)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((d, k)).astype(np.float32))
    y = depthwise_conv1d(x, w, None, padding=1, is_bhl=True)
    assert y.dtype == jnp.bfloat16
    y_ref = _ref_conv1d(x, w, None, 1)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32), atol=5e-2
    )


@pytest.mark.parametrize("is_bhl", [True, False])
@pytest.mark.parametrize("k", [3, 5, 7, 9])
def test_pallas_tiled_long_l(rng, monkeypatch, is_bhl, k):
    """L > _L_TILE takes the tiled path with cross-tile halos (here _L_TILE
    is shrunk so the multi-tile logic runs quickly in interpret mode)."""
    from flashfftconv_tpu.ops import depthwise as dw

    monkeypatch.setattr(dw, "_L_TILE", 64)
    b, d, l, pad = 2, 128, 256, (k - 1) // 2
    w_dk = jnp.asarray(rng.standard_normal((d, k)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((d,)).astype(np.float32))
    if is_bhl:
        x = jnp.asarray(rng.standard_normal((b, d, l)).astype(np.float32))
        assert dw._pallas_ok(x, d, l, pad, k, True)
        y = depthwise_conv1d(x, w_dk, bias, padding=pad, is_bhl=True)
        y_ref = _ref_conv1d(x, w_dk, bias, pad)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)
    else:
        x = jnp.asarray(rng.standard_normal((b, l, d)).astype(np.float32))
        y = depthwise_conv1d(x, w_dk.T, bias, padding=pad, is_bhl=False)
        y_ref = _ref_conv1d(jnp.swapaxes(x, 1, 2), w_dk, bias, pad)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(jnp.swapaxes(y_ref, 1, 2)), atol=1e-4
        )


def test_pallas_tiled_grads(rng, monkeypatch):
    from flashfftconv_tpu.ops import depthwise as dw

    monkeypatch.setenv("FLASHFFTCONV_DW_BWD", "fused")
    monkeypatch.setattr(dw, "_L_TILE", 64)
    b, d, l, k, pad = 1, 128, 192, 5, 2
    x = jnp.asarray(rng.standard_normal((b, d, l)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((d, k)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((d,)).astype(np.float32))

    def loss_mine(x, w, bias):
        return jnp.sum(depthwise_conv1d(x, w, bias, padding=pad, is_bhl=True) ** 2)

    def loss_ref(x, w, bias):
        return jnp.sum(_ref_conv1d(x, w, bias, pad) ** 2)

    g = jax.grad(loss_mine, argnums=(0, 1, 2))(x, w, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, bias)
    for name, a, b_ in zip(["dx", "dw", "dbias"], g, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=1e-3, err_msg=name
        )


@pytest.mark.parametrize("is_bhl", [True, False])
@pytest.mark.parametrize("k", [3, 5, 9])
def test_fused_bwd_tiled(rng, monkeypatch, is_bhl, k):
    """The fused one-pass Pallas backward, including its L-tiled (nt > 1)
    variant, matches AD of the reference conv: {du, dk, dbias} at once."""
    from flashfftconv_tpu.ops import depthwise as dw

    monkeypatch.setenv("FLASHFFTCONV_DW_BWD", "fused")
    monkeypatch.setattr(dw, "_L_TILE", 64)
    monkeypatch.setattr(dw, "_l_tile_bwd", lambda is_bhl: 64)
    b, d, l, pad = 2, 128, 256, (k - 1) // 2
    w_dk = jnp.asarray(rng.standard_normal((d, k)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((d,)).astype(np.float32))
    if is_bhl:
        x = jnp.asarray(rng.standard_normal((b, d, l)).astype(np.float32))
        w = w_dk
    else:
        x = jnp.asarray(rng.standard_normal((b, l, d)).astype(np.float32))
        w = w_dk.T

    def loss_mine(x, w, bias):
        return jnp.sum(depthwise_conv1d(x, w, bias, padding=pad, is_bhl=is_bhl) ** 2)

    def loss_ref(x, w, bias):
        xb = x if is_bhl else jnp.swapaxes(x, 1, 2)
        wd = w if is_bhl else w.T
        return jnp.sum(_ref_conv1d(xb, wd, bias, pad) ** 2)

    g = jax.grad(loss_mine, argnums=(0, 1, 2))(x, w, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, bias)
    for name, a, b_ in zip(["dx", "dw", "dbias"], g, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-3,
            err_msg=f"{name} is_bhl={is_bhl} k={k}",
        )


@pytest.mark.parametrize("is_bhl", [True, False])
def test_conv_transpose_bwd_path(rng, monkeypatch, is_bhl):
    """FLASHFFTCONV_DW_BWD_CONVS routes the backward through XLA's
    grouped-conv linear transposes; grads must match the reference."""
    monkeypatch.setenv("FLASHFFTCONV_DW_BWD_CONVS", "1")
    b, d, l, k, pad = 2, 128, 64, 5, 2
    w_dk = jnp.asarray(rng.standard_normal((d, k)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((d,)).astype(np.float32))
    if is_bhl:
        x = jnp.asarray(rng.standard_normal((b, d, l)).astype(np.float32))
        w = w_dk
    else:
        x = jnp.asarray(rng.standard_normal((b, l, d)).astype(np.float32))
        w = w_dk.T

    def loss_mine(x, w, bias):
        return jnp.sum(depthwise_conv1d(x, w, bias, padding=pad, is_bhl=is_bhl) ** 2)

    def loss_ref(x, w, bias):
        xb = x if is_bhl else jnp.swapaxes(x, 1, 2)
        wd = w if is_bhl else w.T
        return jnp.sum(_ref_conv1d(xb, wd, bias, pad) ** 2)

    g = jax.grad(loss_mine, argnums=(0, 1, 2))(x, w, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, bias)
    for name, a, b_ in zip(["dx", "dw", "dbias"], g, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=1e-3, err_msg=f"{name} is_bhl={is_bhl}"
        )


@pytest.mark.parametrize("is_bhl", [True, False])
def test_default_bwd_is_xla_floor(rng, is_bhl):
    """Default mode ('xla'): under differentiation both the forward value
    and the grads come from the XLA grouped conv — grads match the reference
    AD and the primal value matches the no-grad (Pallas) forward."""
    b, d, l, k, pad = 2, 128, 64, 5, 2
    w_dk = jnp.asarray(rng.standard_normal((d, k)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((d,)).astype(np.float32))
    if is_bhl:
        x = jnp.asarray(rng.standard_normal((b, d, l)).astype(np.float32))
        w = w_dk
    else:
        x = jnp.asarray(rng.standard_normal((b, l, d)).astype(np.float32))
        w = w_dk.T

    def loss_mine(x, w, bias):
        return jnp.sum(depthwise_conv1d(x, w, bias, padding=pad, is_bhl=is_bhl) ** 2)

    def loss_ref(x, w, bias):
        xb = x if is_bhl else jnp.swapaxes(x, 1, 2)
        wd = w if is_bhl else w.T
        return jnp.sum(_ref_conv1d(xb, wd, bias, pad) ** 2)

    (v, g) = jax.value_and_grad(loss_mine, argnums=(0, 1, 2))(x, w, bias)
    (v_ref, g_ref) = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(x, w, bias)
    np.testing.assert_allclose(float(v), float(v_ref), rtol=1e-5)
    # primal (no-grad) value agrees with the differentiated-forward value
    y = depthwise_conv1d(x, w, bias, padding=pad, is_bhl=is_bhl)
    np.testing.assert_allclose(
        float(jnp.sum(y**2)), float(v), rtol=1e-5
    )
    for name, a, b_ in zip(["dx", "dw", "dbias"], g, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=1e-3, err_msg=f"{name} is_bhl={is_bhl}"
        )


@pytest.mark.parametrize("is_bhl", [True, False])
def test_causal_padding_matches_reference_conv(rng, is_bhl):
    """padding=(K-1, 0) == the reference models' causal short filter
    (Conv1d(padding=K-1) + [..., :L], hyena.py:273-303): output depends on
    x[t-K+1..t] only."""
    b, d, l, k = 2, 128, 64, 5
    x = rng.standard_normal((b, d, l) if is_bhl else (b, l, d)).astype(np.float32)
    w = rng.standard_normal((d, k) if is_bhl else (k, d)).astype(np.float32)
    bias = rng.standard_normal(d).astype(np.float32)
    out = depthwise_conv1d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias),
        padding=(k - 1, 0), is_bhl=is_bhl,
    )
    # oracle: left-pad K-1, valid conv
    xf = x if is_bhl else x.transpose(0, 2, 1)
    wf = w if is_bhl else w.T
    xp = np.pad(xf, ((0, 0), (0, 0), (k - 1, 0)))
    ref = np.zeros((b, d, l), np.float32)
    for tap in range(k):
        ref += xp[..., tap : tap + l] * wf[:, tap][None, :, None]
    ref += bias[None, :, None]
    got = np.asarray(out) if is_bhl else np.asarray(out).transpose(0, 2, 1)
    np.testing.assert_allclose(got, ref, atol=1e-4)


@pytest.mark.parametrize("is_bhl", [True, False])
def test_causal_padding_tiled_pallas(rng, is_bhl):
    """The L-tiled Pallas path accepts causal (K-1, 0) padding (same-length
    output) and matches the XLA path, gradients included."""
    b, d, k = 1, 128, 5
    l = (2048 if is_bhl else 4096) * 2  # force the tiled path
    x = jnp.asarray(
        rng.standard_normal((b, d, l) if is_bhl else (b, l, d)).astype(np.float32)
    )
    w = jnp.asarray(
        rng.standard_normal((d, k) if is_bhl else (k, d)).astype(np.float32)
    )
    y_p = depthwise_conv1d(x, w, None, padding=(k - 1, 0), is_bhl=is_bhl, impl="pallas")
    y_x = depthwise_conv1d(x, w, None, padding=(k - 1, 0), is_bhl=is_bhl, impl="xla")
    assert y_p.shape == x.shape
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), atol=1e-4)

    def loss(impl):
        return lambda x, w: jnp.sum(
            depthwise_conv1d(x, w, None, padding=(k - 1, 0), is_bhl=is_bhl, impl=impl) ** 2
        )

    gp = jax.grad(loss("pallas"), argnums=(0, 1))(x, w)
    gx = jax.grad(loss("xla"), argnums=(0, 1))(x, w)
    for a, b2 in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2), atol=2e-2, rtol=1e-3)
