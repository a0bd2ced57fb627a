"""Implicit convolution-kernel generators (Hyena filters).

Flax ports of the reference's filter stack
(/root/reference/examples/bert/hyena_utils.py:64-256, identical classes in
examples/hyena/src/models/sequence/hyena.py): a small MLP with sinusoidal
activations maps complex-exponential positional embeddings to a (L, d)
filter, modulated by learned exponential decay. These generate the long-conv
kernels consumed by FlashFFTConv in the Hyena / M2-BERT / HyenaDNA models.

Parameter groups: filter parameters should train with their own lr/wd (the
reference's `_optim` tags); `flashfftconv_tpu.utils.optim.make_optimizer`
matches them by the "filter" path fragment.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class Sin(nn.Module):
    """Sinusoidal activation with (optionally trainable) frequency
    (hyena_utils.py:64-77)."""

    dim: int
    w: float = 10.0
    w_mod: float = 1.0
    train_freq: bool = True

    @nn.compact
    def __call__(self, x):
        if self.train_freq:
            freq = self.param(
                "freq", lambda key, shape: jnp.full(shape, self.w, jnp.float32), (1, self.dim)
            )
            # Keep the activation in x's dtype: an f32 freq would promote a
            # bf16 implicit-MLP stream (see HyenaFilter.mlp_dtype) back to
            # f32, reinstating the 256 MB/layer temps at L=1M.
            freq = freq.astype(x.dtype)
        else:
            freq = self.w
        return jnp.sin(self.w_mod * freq * x)


def positional_embedding(emb_dim: int, seq_len: int):
    """Complex-exponential positional embeddings (hyena_utils.py:80-103).

    Returns (z, t): z (1, L, emb_dim) = [t, Re(e^{-i f w}), Im(e^{-i f w})],
    t (1, L, 1) normalized time. Computed in numpy f64 at init; constants.
    """
    if emb_dim % 2 == 0 or emb_dim < 3:
        raise ValueError("emb_dim must be odd and >= 3 (time, sine, cosine)")
    t = np.linspace(0, 1, seq_len)[None, :, None]
    bands = (emb_dim - 1) // 2
    t_rescaled = np.linspace(0, seq_len - 1, seq_len)[None, :, None]
    w = 2 * math.pi * t_rescaled / seq_len
    f = np.linspace(1e-4, bands - 1, bands)[None, None]
    z = np.exp(-1j * f * w)
    z = np.concatenate([t, z.real, z.imag], axis=-1)
    return jnp.asarray(z, jnp.float32), jnp.asarray(t, jnp.float32)


class ExponentialModulation(nn.Module):
    """Per-channel exponential decay envelope (hyena_utils.py:105-127)."""

    d_model: int
    fast_decay_pct: float = 0.3
    slow_decay_pct: float = 1.5
    target: float = 1e-2
    shift: float = 0.0
    learn_modulation: bool = False

    @nn.compact
    def __call__(self, t, x):
        max_decay = math.log(self.target) / self.fast_decay_pct
        min_decay = math.log(self.target) / self.slow_decay_pct
        init = np.linspace(min_decay, max_decay, self.d_model)[None, None]
        if self.learn_modulation:
            deltas = self.param("deltas", lambda key, s: jnp.asarray(init, jnp.float32),
                                init.shape)
        else:
            deltas = jnp.asarray(init, jnp.float32)
        # Decay math stays f32 (exp of a large-range product); only the
        # final envelope is cast, so a bf16 implicit-MLP stream (see
        # HyenaFilter.mlp_dtype) isn't promoted back to an f32 (1, L, d)
        # temp — 1 GB at L=1M.
        decay = jnp.exp(-t * jnp.abs(deltas))
        return x * (decay + self.shift).astype(x.dtype)


class HyenaFilter(nn.Module):
    """Implicit long filter with modulation (hyena_utils.py:129-256).

    ``filter(L)`` (here: __call__) returns the (1, L, d_model) kernel; the
    bidirectional variant is assembled by the caller as
    pad(k, (0, L)) + pad(flip(k_rev), (L, 0)) — see models.m2_bert.
    """

    d_model: int
    emb_dim: int = 3
    order: int = 16  # width of the implicit MLP
    seq_len: int = 1024
    dropout: float = 0.0
    w: float = 1.0
    w_mod: float = 1.0
    num_inner_mlps: int = 2
    use_bias: bool = True
    modulate: bool = True
    normalized: bool = False
    linear_mixer: bool = False
    modulation_args: dict | None = None
    # Compute dtype of the implicit MLP (params stay f32). The MLP is
    # pointwise in L, so at L=1M each f32 Dense activation is a 256 MB
    # backward temp (x3 layers); bf16 halves them. The kernel it produces
    # is consumed by a bf16 conv (filter_output_dtype) at that scale anyway.
    mlp_dtype: Any = None

    def setup(self):
        self.z, self.t = positional_embedding(self.emb_dim, self.seq_len)
        # Bias used by callers that add a skip term (fftconv + bias * x).
        self.bias = self.param("bias", nn.initializers.normal(1.0), (self.d_model,))
        dt = self.mlp_dtype
        if self.linear_mixer:
            self.layers = [nn.Dense(self.d_model, use_bias=False, dtype=dt,
                                    name="mixer")]
        else:
            layers = [nn.Dense(self.order, dtype=dt),
                      Sin(dim=self.order, w=self.w, w_mod=self.w_mod)]
            for i in range(self.num_inner_mlps):
                layers.append(nn.Dense(self.order, dtype=dt))
                layers.append(Sin(dim=self.order, w=self.w, w_mod=self.w_mod))
            layers.append(nn.Dense(self.d_model, use_bias=False, dtype=dt))
            self.layers = layers
        self.modulation = ExponentialModulation(
            self.d_model, **(self.modulation_args or {})
        )

    def __call__(self, length: int):
        z = self.z[:, :length]
        t = self.t[:, :length]
        h = z.astype(self.mlp_dtype) if self.mlp_dtype is not None else z
        for layer in self.layers:
            h = layer(h)
        if self.modulate:
            h = self.modulation(t, h)
        if self.normalized:
            h = h / jnp.linalg.norm(h, ord=1, axis=-1, keepdims=True)
        return h  # (1, L, d_model)
