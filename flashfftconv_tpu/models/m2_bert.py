"""Monarch Mixer (M2) BERT components on FlashFFTConv (flax).

Ports of the reference M2-BERT example:
  - MonarchMixerSequenceMixing
    (/root/reference/examples/bert/monarch_mixer_sequence_mixer_flashfftconv.py:15-172):
    gated bidirectional long-conv sequence mixer — in-projection to (x1, x2, v),
    short depthwise conv, y = conv(x1*v, k_bidirectional) * x2, optional
    residual long conv, optional precomputed-kernel inference mode.
  - BlockdiagLinear (examples/bert/blockdiag_linear.py:12,
    blockdiag_multiply.py:37): block-diagonal (Monarch) dense layer used for
    the M2 MLP dimension mixer. On TPU this is a single batched einsum —
    XLA maps it straight onto the MXU; no custom autograd needed.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from flashfftconv_tpu.models.filters import HyenaFilter
from flashfftconv_tpu.models.hyena import ShortDepthwiseConv
from flashfftconv_tpu.ops import dispatch
from flashfftconv_tpu.ops.plan import get_plan


def blockdiag_multiply(x: jax.Array, weight: jax.Array) -> jax.Array:
    """x (..., nblocks*p) @ block-diagonal weight (nblocks, q, p) ->
    (..., nblocks*q). Parity with blockdiag_multiply.py:14-34."""
    nblocks, q, p = weight.shape
    x_r = x.reshape(*x.shape[:-1], nblocks, p)
    out = jnp.einsum("...kp,kqp->...kq", x_r, weight.astype(x.dtype))
    return out.reshape(*x.shape[:-1], nblocks * q)


class BlockdiagLinear(nn.Module):
    """Block-diagonal (Monarch) linear layer."""

    features: int
    nblocks: int = 4
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        if in_features % self.nblocks or self.features % self.nblocks:
            raise ValueError(
                f"in/out features ({in_features}, {self.features}) must divide "
                f"nblocks={self.nblocks}"
            )
        p = in_features // self.nblocks
        q = self.features // self.nblocks
        # Dense-equivalent init scaled by sqrt(dense/sparse param ratio)
        # (blockdiag_linear.py:27-37).
        scale = (self.nblocks) ** 0.5
        w = self.param(
            "weight",
            lambda key, shape: jax.random.normal(key, shape)
            * scale
            / (in_features**0.5),
            (self.nblocks, q, p),
        )
        y = blockdiag_multiply(x, w)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


def bidirectional_kernel(k_fwd: jax.Array, k_rev: jax.Array, length: int):
    """k = pad(k_fwd, (0, L)) + pad(flip(k_rev), (L, 0)) — the reference's
    bidirectional kernel construction (monarch_mixer...py:148-149). Shapes
    (H, L) -> (H, 2L)."""
    zeros = jnp.zeros_like(k_fwd[..., :length])
    fwd = jnp.concatenate([k_fwd, zeros], axis=-1)
    rev = jnp.concatenate([zeros, jnp.flip(k_rev, axis=-1)], axis=-1)
    return fwd + rev


class MonarchMixerSequenceMixing(nn.Module):
    """M2-BERT sequence mixer (gated bidirectional FlashFFTConv)."""

    d_model: int
    l_max: int = 128
    bidirectional: bool = False
    residual_long_conv: bool = False
    inference_mode: bool = False
    hyena_w: float = 10.0
    hyena_w_mod: float = 1.0
    hyena_emb_dim: int = 5
    hyena_filter_order: int = 16
    hyena_filter_dropout: float = 0.0
    conv_dtype: Any = jnp.bfloat16
    impl: str = "auto"

    def _kernel(self, name: str, length: int):
        filter_len = 2 * self.l_max if self.bidirectional else self.l_max
        if self.inference_mode:
            # Kernel as a plain weight (monarch_mixer...py:56-63).
            return self.param(
                name, nn.initializers.normal(1.0), (self.d_model, filter_len)
            )
        f = HyenaFilter(
            self.d_model,
            emb_dim=self.hyena_emb_dim,
            order=self.hyena_filter_order,
            seq_len=self.l_max,
            dropout=self.hyena_filter_dropout,
            w=self.hyena_w,
            w_mod=self.hyena_w_mod,
            name=name,
        )
        k = f(length)[0].T  # (d_model, L)
        if self.bidirectional:
            f_rev = HyenaFilter(
                self.d_model,
                emb_dim=self.hyena_emb_dim,
                order=self.hyena_filter_order,
                seq_len=self.l_max,
                dropout=self.hyena_filter_dropout,
                w=self.hyena_w,
                w_mod=self.hyena_w_mod,
                name=name + "_rev",
            )
            k_rev = f_rev(length)[0].T
            k = bidirectional_kernel(k, k_rev, length)
        return k

    @nn.compact
    def __call__(self, u, deterministic: bool = True):
        # u: (B, L, H)
        b, l, h = u.shape
        seqlen = 2 * self.l_max
        plan = get_plan(seqlen, jnp.dtype(self.conv_dtype).name)
        conv = lambda x, k: dispatch.fft_conv(plan, x, k, impl=self.impl)

        u = jnp.swapaxes(u, -1, -2)  # (B, H, L)
        w_in = self.param(
            "in_linear", nn.initializers.lecun_normal(), (3 * self.d_model, self.d_model)
        )
        x1x2v = jnp.einsum("od,bdl->bol", w_in.astype(u.dtype), u)
        x1x2v = ShortDepthwiseConv(3 * self.d_model, 3, padding=1, name="short_filter")(
            x1x2v
        )
        x1, x2, v = jnp.split(x1x2v, 3, axis=1)

        k = self._kernel("filter", l)
        y = conv(x1 * v, k)
        if self.residual_long_conv:
            k2 = self._kernel("filter2", l)
            yu = conv(v, k2)
        y = y * x2
        if self.residual_long_conv:
            y = y + yu

        y = jnp.swapaxes(y, -1, -2)  # (B, L, H)
        return nn.Dense(self.d_model, dtype=u.dtype, name="out_linear")(y)
