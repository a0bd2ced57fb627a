"""Long Conv sequence model (flax.linen), the TPU port of the reference's
standalone Long Conv example (/root/reference/flashfftconv_long_convs.py).

Architecture parity:
  - `LongConv` layer (reference lines 31-91): learned kernel of length 2*L
    with the squash operator relu(|k| - lam) * sign(k), kernel dropout, FFT
    conv at seqlen 2*L via a shared plan, D skip connection, GELU, GLU output
    mixing.
  - `LongConvModel` (lines 94-165): linear encoder, n_layers residual blocks
    with post-norm, mean pooling, linear decoder.
  - Per-parameter optimizer hyperparameters (the reference's `_optim`
    attribute, lines 16-29) map to optax.multi_transform labels: kernel
    params are labeled "kernel" (custom lr, no weight decay); see
    flashfftconv_tpu.utils.optim.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from flashfftconv_tpu.ops import dispatch
from flashfftconv_tpu.ops.plan import get_plan


class LongConv(nn.Module):
    """Long convolution layer with squash operator and GLU output mixing."""

    h: int
    l_max: int  # input sequence length; FFT size is 2*l_max (causal, no wrap)
    channels: int = 1
    dropout: float = 0.1
    kernel_lam: float = 0.1
    kernel_dropout: float = 0.0
    conv_dtype: Any = jnp.bfloat16
    impl: str = "auto"
    # Sequence-sharded (context-parallel) conv: set seq_mesh to a Mesh whose
    # seq_axis axis carries the sequence and the layer trains at lengths no
    # single chip can hold (parallel/seq_conv.py) — beyond the reference,
    # whose conv is strictly single-device.
    seq_mesh: Any = None
    seq_axis: str = "sp"

    @nn.compact
    def __call__(self, u, deterministic: bool = True):
        # u: (B, H, L)
        length = u.shape[-1]
        seqlen = 2 * self.l_max

        kernel = self.param(
            "kernel",
            lambda key, shape: jax.random.normal(key, shape) * 0.002,
            (self.channels, self.h, seqlen),
        )
        d_skip = self.param("D", nn.initializers.normal(1.0), (self.channels, self.h))

        # Squash operator (reference line 72).
        k = nn.relu(jnp.abs(kernel) - self.kernel_lam) * jnp.sign(kernel)
        if self.kernel_dropout > 0:
            k = nn.Dropout(rate=self.kernel_dropout)(k, deterministic=deterministic)

        if self.seq_mesh is not None:
            from flashfftconv_tpu.parallel.seq_conv import seq_fft_conv_padded

            conv = lambda u, k: seq_fft_conv_padded(
                u, k, self.seq_mesh, seqlen=seqlen, axis=self.seq_axis,
                compute_dtype=self.conv_dtype,
            )
        else:
            plan = get_plan(seqlen, jnp.dtype(self.conv_dtype).name)
            conv = lambda u, k: dispatch.fft_conv(plan, u, k, impl=self.impl)
        y = jax.checkpoint(conv)(u, k[0])  # channels == 1 path, like the reference
        y = y[:, None]  # (B, 1, H, L)

        # Skip connection: y += einsum('bhl,ch->bchl', u, D)
        y = y + jnp.einsum("bhl,ch->bchl", u.astype(jnp.float32), d_skip).astype(y.dtype)
        y = y.reshape(y.shape[0], self.channels * self.h, length)

        y = nn.gelu(y.astype(jnp.float32)).astype(u.dtype)
        y = nn.Dropout(rate=self.dropout)(y, deterministic=deterministic)

        # Output mixing: Linear(C*H -> 2H) + GLU, applied along the channel dim.
        y = jnp.swapaxes(y, -1, -2)  # (B, L, C*H)
        y = nn.Dense(2 * self.h, dtype=u.dtype, name="output_linear")(y)
        y = nn.glu(y, axis=-1)
        y = jnp.swapaxes(y, -1, -2)  # (B, H, L)
        return y


class LongConvModel(nn.Module):
    """Residual stack of LongConv blocks for sequence classification (sCIFAR)."""

    d_input: int
    d_output: int = 10
    d_model: int = 512
    n_layers: int = 6
    dropout: float = 0.1
    prenorm: bool = False
    kernel_lam: float = 0.1
    kernel_dropout: float = 0.0
    channels: int = 1
    l_max: int = 1024
    conv_dtype: Any = jnp.bfloat16
    impl: str = "auto"
    seq_mesh: Any = None
    seq_axis: str = "sp"

    @nn.compact
    def __call__(self, x, deterministic: bool = True, mask=None):
        # x: (B, L, d_input); mask: optional (B, L) bool/0-1 of valid
        # positions — when given, the classification pool is a masked mean
        # (the LRA convention for right-padded token tasks: with ~75% pad
        # positions at listops-1000 scale an unmasked mean buries the
        # sequence features under a constant pad component and the head
        # sits at the class prior).
        x = nn.Dense(self.d_model, dtype=x.dtype, name="encoder")(x)
        x = jnp.swapaxes(x, -1, -2)  # (B, d_model, L)

        for i in range(self.n_layers):
            z = x
            norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=f"norm_{i}")
            if self.prenorm:
                z = jnp.swapaxes(
                    norm(jnp.swapaxes(z, -1, -2).astype(jnp.float32)), -1, -2
                ).astype(x.dtype)
            z = LongConv(
                h=self.d_model,
                l_max=self.l_max,
                channels=self.channels,
                dropout=self.dropout,
                kernel_lam=self.kernel_lam,
                kernel_dropout=self.kernel_dropout,
                conv_dtype=self.conv_dtype,
                impl=self.impl,
                seq_mesh=self.seq_mesh,
                seq_axis=self.seq_axis,
                name=f"layer_{i}",
            )(z, deterministic=deterministic)
            z = nn.Dropout(rate=self.dropout)(z, deterministic=deterministic)
            x = z + x
            if not self.prenorm:
                x = jnp.swapaxes(
                    norm(jnp.swapaxes(x, -1, -2).astype(jnp.float32)), -1, -2
                ).astype(z.dtype)

        x = jnp.swapaxes(x, -1, -2)  # (B, L, d_model)
        if mask is not None:
            m = mask.astype(jnp.float32)[..., None]
            x = (x.astype(jnp.float32) * m).sum(axis=1) / jnp.maximum(
                m.sum(axis=1), 1.0
            )
        else:
            x = x.mean(axis=1)
        return nn.Dense(self.d_output, dtype=jnp.float32, name="decoder")(x)


class LongConvOperator(nn.Module):
    """LongConv as a (B, L, D) sequence mixer for lm.Block / SequenceModel.

    Thin layout adapter around LongConv (which works channels-first like the
    reference's flashfftconv_long_convs.py:31) so `mixer="long-conv"`
    composes with the generic block/harness plumbing the same way hyena/h3/
    m2/mha do."""

    d_model: int
    l_max: int
    lam: float = 0.003
    dropout: float = 0.0
    conv_dtype: Any = jnp.bfloat16
    impl: str = "auto"
    seq_mesh: Any = None
    seq_axis: str = "sp"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        u = jnp.swapaxes(x, -1, -2)  # (B, D, L)
        y = LongConv(
            h=self.d_model,
            l_max=self.l_max,
            dropout=self.dropout,
            kernel_lam=self.lam,
            conv_dtype=self.conv_dtype,
            impl=self.impl,
            seq_mesh=self.seq_mesh,
            seq_axis=self.seq_axis,
            name="conv",
        )(u, deterministic=deterministic)
        return jnp.swapaxes(y, -1, -2)
