"""Short depthwise 1-D convolution (the reference's ``FlashDepthWiseConv1d``).

Reference behavior (/root/reference/flashfftconv/depthwise_1d.py and
csrc/flashfftconv/conv1d/): depthwise conv1d with stride 1, dilation 1, odd
kernel size, symmetric zero padding, optional bias, in two layouts:

  - BHL: x (B, D, L), weights (D, K)  -> out (B, D, L + 2*pad - K + 1)
  - BLH: x (B, L, D), weights (K, D)  -> out (B, L + 2*pad - K + 1, D)

Mixed precision is supported as in the reference's 9-way dtype dispatch
(conv1d/shared.h:10-50): activations in {f32, bf16, f16}, weights/bias in any
of the same; compute accumulates in f32 and the output takes the activation
dtype.

On TPU the XLA path below is already strong: a K-tap depthwise conv is K
shifted axpys which XLA fuses into a few VPU passes. A Pallas kernel
(`_pallas_depthwise`) covers the large-D/L regime where roll-based fusion
wins over lax.conv's im2col.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Largest L whose full (L, D_TILE) channel strip fits VMEM in the Pallas
# kernel (bf16 in + f32 accumulator + per-tap temps, double-buffered).
_PALLAS_MAX_L = 4096
_D_TILE = 128


def _check(weights, bias, k):
    if k % 2 != 1:
        # Parity with the reference constraint (csrc/flashfftconv/conv1d/conv1d.h:67).
        raise ValueError(f"kernel size must be odd, got {k}")
    if bias is not None and bias.shape != weights.shape[:1] and bias.ndim != 1:
        raise ValueError(f"bias shape {bias.shape} incompatible")


def _xla_depthwise(x, w_kd, bias, padding, is_bhl, out_dtype):
    """Fallback path: grouped lax.conv for 3D inputs (XLA's depthwise conv is
    near bandwidth-bound on TPU for large strips), K shifted multiply-adds
    otherwise."""
    k, d = w_kd.shape
    if x.ndim == 3:
        dn = ("NCH", "OIH", "NCH") if is_bhl else ("NHC", "OIH", "NHC")
        # Matching operand dtypes keep the AD transpose of the conv valid
        # (preferred_element_type would make the cotangent dtype mismatch).
        out = lax.conv_general_dilated(
            x,
            w_kd.T[:, None, :].astype(x.dtype),
            window_strides=(1,),
            padding=[(padding, padding)],
            feature_group_count=d,
            dimension_numbers=dn,
        ).astype(jnp.float32)
        if bias is not None:
            bias_f = bias.astype(jnp.float32)
            out = out + (bias_f[None, :, None] if is_bhl else bias_f[None, None, :])
        return out.astype(out_dtype)

    xf = x.astype(jnp.float32)
    wf = w_kd.astype(jnp.float32)
    if is_bhl:
        xp = jnp.pad(xf, ((0, 0), (0, 0), (padding, padding)))
        l_out = xp.shape[-1] - k + 1
        out = jnp.zeros(xp.shape[:-1] + (l_out,), jnp.float32)
        for tap in range(k):
            out = out + xp[..., tap : tap + l_out] * wf[tap][None, :, None]
        if bias is not None:
            out = out + bias.astype(jnp.float32)[None, :, None]
    else:
        xp = jnp.pad(xf, ((0, 0), (padding, padding), (0, 0)))
        l_out = xp.shape[1] - k + 1
        out = jnp.zeros((xp.shape[0], l_out, xp.shape[2]), jnp.float32)
        for tap in range(k):
            out = out + xp[:, tap : tap + l_out, :] * wf[tap][None, None, :]
        if bias is not None:
            out = out + bias.astype(jnp.float32)[None, None, :]
    return out.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("padding", "is_bhl", "out_dtype"))
def _pallas_depthwise(x, w_kd, bias, padding, is_bhl, out_dtype):
    """Fused Pallas depthwise conv: one bandwidth-bound pass.

    The TPU analog of the reference's conv1d kernels
    (csrc/flashfftconv/conv1d/conv1d_bhl.cu:44-132): each grid step loads a
    full-length (L, D_TILE) channel strip into VMEM and does the K-tap
    multiply-accumulate on the VPU in f32 (weights are scalars per tap), so
    HBM traffic is exactly one read + one write of x.
    """
    k = w_kd.shape[0]
    half = k - 1 - padding  # taps beyond the end

    if is_bhl:
        b, d, l = x.shape
        grid = (b, d // _D_TILE)
        x_spec = pl.BlockSpec(
            (1, _D_TILE, l), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        )
        w_spec = pl.BlockSpec(
            (k, _D_TILE), lambda i, j: (0, j), memory_space=pltpu.VMEM
        )
        b_spec = pl.BlockSpec((1, _D_TILE), lambda i, j: (0, j), memory_space=pltpu.VMEM)
        l_out = l + 2 * padding - k + 1
        out_spec = pl.BlockSpec(
            (1, _D_TILE, l_out), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((b, d, l_out), out_dtype)
    else:
        b, l, d = x.shape
        grid = (b, d // _D_TILE)
        x_spec = pl.BlockSpec(
            (1, l, _D_TILE), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        )
        w_spec = pl.BlockSpec(
            (k, _D_TILE), lambda i, j: (0, j), memory_space=pltpu.VMEM
        )
        b_spec = pl.BlockSpec((1, _D_TILE), lambda i, j: (0, j), memory_space=pltpu.VMEM)
        l_out = l + 2 * padding - k + 1
        out_spec = pl.BlockSpec(
            (1, l_out, _D_TILE), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((b, l_out, d), out_dtype)

    has_bias = bias is not None

    l_in = x.shape[-1] if is_bhl else x.shape[-2]

    def kernel(*refs):
        # Per-tap static slice arithmetic — no padded copy, so the working
        # set is just the bf16 input strip + one f32 accumulator.
        #   out[l] = sum_tap w[tap] * x[l + tap - padding],
        #   valid where 0 <= l + tap - padding < L.
        if has_bias:
            x_ref, w_ref, bias_ref, o_ref = refs
        else:
            x_ref, w_ref, o_ref = refs
        acc = jnp.zeros(
            (_D_TILE, l_out) if is_bhl else (l_out, _D_TILE), jnp.float32
        )
        for tap in range(k):
            s = tap - padding
            lo = max(0, -s)
            hi = min(l_out, l_in - s)
            if lo >= hi:
                continue
            if is_bhl:
                seg = x_ref[0, :, lo + s : hi + s].astype(jnp.float32)
                term = seg * w_ref[tap].astype(jnp.float32)[:, None]
                acc = acc + jnp.pad(term, ((0, 0), (lo, l_out - hi)))
            else:
                seg = x_ref[0, lo + s : hi + s, :].astype(jnp.float32)
                term = seg * w_ref[tap].astype(jnp.float32)[None, :]
                acc = acc + jnp.pad(term, ((lo, l_out - hi), (0, 0)))
        if has_bias:
            bias_v = bias_ref[0].astype(jnp.float32)
            acc = acc + (bias_v[:, None] if is_bhl else bias_v[None, :])
        o_ref[0] = acc.astype(o_ref.dtype)

    in_specs = [x_spec, w_spec] + ([b_spec] if has_bias else [])
    inputs = [x, w_kd] + ([bias.reshape(1, -1)] if has_bias else [])
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=jax.default_backend() != "tpu",
    )(*inputs)


def _pallas_ok(x, d, l, padding, k) -> bool:
    return (
        d % _D_TILE == 0
        and l <= _PALLAS_MAX_L
        and padding <= k - 1  # output never needs left context beyond pad
    )


def depthwise_conv1d(
    x: jax.Array,
    weights: jax.Array,
    bias: jax.Array | None = None,
    padding: int = 0,
    is_bhl: bool = True,
) -> jax.Array:
    """Depthwise conv1d matching the reference ``conv1d_forward`` semantics.

    Args:
      x: (B, D, L) if is_bhl else (B, L, D).
      weights: (D, K) if is_bhl else (K, D).
      bias: (D,) or None.
      padding: symmetric zero padding; output length L + 2*padding - K + 1.
    """
    if is_bhl:
        d, k = weights.shape
        w_kd = weights.T  # (K, D)
        l = x.shape[-1]
    else:
        k, d = weights.shape
        w_kd = weights
        l = x.shape[-2]
    _check(weights, bias, k)
    out_dtype = x.dtype

    if x.ndim == 3 and _pallas_ok(x, d, l, padding, k):
        return _dw_conv(x, w_kd, bias, padding, is_bhl, out_dtype)
    return _xla_depthwise(x, w_kd, bias, padding, is_bhl, out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _dw_conv(x, w_kd, bias, padding, is_bhl, out_dtype):
    return _pallas_depthwise(x, w_kd, bias, padding, is_bhl, out_dtype)


def _dw_fwd(x, w_kd, bias, padding, is_bhl, out_dtype):
    return _dw_conv(x, w_kd, bias, padding, is_bhl, out_dtype), (x, w_kd, bias)


def _dw_bwd(padding, is_bhl, out_dtype, res, dout):
    """du via the same kernel with flipped weights (correlation); dk/dbias via
    XLA reductions — the {du, dk, dbias} triple of the reference's
    conv1d_backward (csrc/flashfftconv/conv1d/conv1d.h:76-96)."""
    x, w_kd, bias = res
    k = w_kd.shape[0]
    # Transposed conv: pad' = k - 1 - padding gives du of length L.
    du = _pallas_depthwise(
        dout, jnp.flip(w_kd, axis=0), None, k - 1 - padding, is_bhl, jnp.float32
    ).astype(x.dtype)

    axis = -1 if is_bhl else -2
    xp_pad = [(0, 0)] * x.ndim
    xp_pad[axis] = (padding, padding)
    xf = jnp.pad(x.astype(jnp.float32), xp_pad)
    df = dout.astype(jnp.float32)
    l_out = dout.shape[axis]
    taps = []
    for tap in range(k):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(tap, tap + l_out)
        seg = xf[tuple(sl)]
        if is_bhl:
            taps.append(jnp.einsum("bdl,bdl->d", seg, df))
        else:
            taps.append(jnp.einsum("bld,bld->d", seg, df))
    dw = jnp.stack(taps, axis=0).astype(w_kd.dtype)  # (K, D)
    if bias is None:
        dbias = None
    else:
        sum_axes = (0, 2) if is_bhl else (0, 1)
        dbias = df.sum(sum_axes).astype(bias.dtype)
    return du, dw, dbias


_dw_conv.defvjp(_dw_fwd, _dw_bwd)
