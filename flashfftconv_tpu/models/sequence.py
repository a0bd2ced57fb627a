"""Generic sequence-task harness: encoders, pooling, decoders, SequenceModel.

TPU port of the reference harness's task plumbing
(/root/reference/examples/hyena/src/tasks/encoders.py, decoders.py,
src/models/sequence/{model,pool}.py): the pieces that turn a registered
sequence mixer into a full model for an arbitrary task — input encoders
(embedding / one-hot / linear / sinusoidal-position / image patches),
between-stage pooling (average / linear / spectral), output decoders
(last / first / mean / causal-pool / sum restriction + projection, and the
LRA-retrieval dual-sequence head), and a `SequenceModel` that composes
encoder -> repeated mixer blocks (with optional pooling between stages) ->
decoder from registry-style configs.

Differences from the reference are deliberate TPU-isms: everything is a flax
module over (B, L, D) arrays with static shapes; the ragged/lengths handling
is vectorized masking instead of the reference's per-sample Python loop
(decoders.py:122-130 unbinds the batch — a host loop XLA cannot compile).
"""

from __future__ import annotations

import math
from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from flashfftconv_tpu.models.lm import Block

# ---------------------------------------------------------------------------
# Encoders (dataset -> backbone). Reference: src/tasks/encoders.py.
# ---------------------------------------------------------------------------


class LinearEncoder(nn.Module):
    """Dense projection of raw features (encoders.py `LayerEncoder`-style
    linear; also LongConvModel's encoder)."""

    d_model: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.d_model, dtype=x.dtype, name="proj")(x)


class EmbeddingEncoder(nn.Module):
    """Token embedding (the `embedding` encoder, encoders.py registry)."""

    n_tokens: int
    d_model: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Embed(self.n_tokens, self.d_model, dtype=self.dtype, name="embed")(x)


class OneHotEncoder(nn.Module):
    """One-hot tokens straight into the model width (encoders.py:242-250)."""

    n_tokens: int
    d_model: int

    @nn.compact
    def __call__(self, x):
        if self.n_tokens > self.d_model:
            raise ValueError("one-hot encoder needs n_tokens <= d_model")
        return jax.nn.one_hot(x, self.d_model, dtype=jnp.float32)


class PositionalEncoder(nn.Module):
    """Additive sinusoidal position encoding (encoders.py:42-92): x + pe,
    dropout after, exactly the reference's buffer formula."""

    d_model: int
    max_len: int = 16384
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        l = x.shape[-2]
        pos = jnp.arange(l)[:, None].astype(jnp.float32)
        div = jnp.exp(
            jnp.arange(0, self.d_model, 2).astype(jnp.float32)
            * (-math.log(10000.0) / self.d_model)
        )
        pe = jnp.zeros((l, self.d_model), jnp.float32)
        pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
        pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
        y = x.astype(jnp.float32) + pe
        y = nn.Dropout(rate=self.dropout)(y, deterministic=deterministic)
        return y.astype(x.dtype)


class PatchEncoder(nn.Module):
    """Image -> patch-sequence encoder (encoders.py Conv2DPatchEncoder:
    252-287): (B, H, W, C) -> (B, H*W/p^2, d_model) via a strided conv."""

    d_model: int
    patch_size: int = 4

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        y = nn.Conv(
            self.d_model, (p, p), strides=(p, p), dtype=x.dtype, name="patch"
        )(x)
        return y.reshape(y.shape[0], -1, self.d_model)


# ---------------------------------------------------------------------------
# Pooling between stages. Reference: src/models/sequence/pool.py.
# ---------------------------------------------------------------------------


class DownAvgPool(nn.Module):
    """Non-overlapping mean pool along L (pool.py:53-103). (B,L,D)->(B,L/s,D)."""

    stride: int = 2

    @nn.compact
    def __call__(self, x):
        b, l, d = x.shape
        if l % self.stride:
            raise ValueError(f"L={l} not divisible by stride {self.stride}")
        return x.reshape(b, l // self.stride, self.stride, d).mean(axis=2)


class DownLinearPool(nn.Module):
    """Learned pool: fold `stride` steps into features, project to
    expand*D (pool.py:213-256)."""

    stride: int = 2
    expand: int = 1

    @nn.compact
    def __call__(self, x):
        b, l, d = x.shape
        if l % self.stride:
            raise ValueError(f"L={l} not divisible by stride {self.stride}")
        y = x.reshape(b, l // self.stride, self.stride * d)
        return nn.Dense(self.expand * d, dtype=x.dtype, name="proj")(y)


class UpLinearPool(nn.Module):
    """Inverse of DownLinearPool: project then unfold (pool.py:258-317)."""

    stride: int = 2
    shrink: int = 1

    @nn.compact
    def __call__(self, x):
        b, l, d = x.shape
        if d % self.shrink:
            raise ValueError(f"D={d} not divisible by shrink {self.shrink}")
        dout = d // self.shrink
        y = nn.Dense(self.stride * dout, dtype=x.dtype, name="proj")(x)
        return y.reshape(b, l * self.stride, dout)


class DownSpectralPool(nn.Module):
    """Fourier low-pass downsample (pool.py:105-143): FFT along L, keep the
    lowest L/stride bands (split low/high like the reference's index_select),
    inverse FFT at the shorter length. Anti-aliased, parameter-free."""

    stride: int = 2

    @nn.compact
    def __call__(self, x):
        l = x.shape[-2]
        if l % self.stride:
            raise ValueError(f"L={l} not divisible by stride {self.stride}")
        new_l = l // self.stride
        xf = jnp.fft.fft(x.astype(jnp.float32), axis=-2)
        lo = xf[..., : new_l - new_l // 2, :]
        hi = xf[..., l - new_l // 2 :, :]
        y = jnp.fft.ifft(jnp.concatenate([lo, hi], axis=-2), axis=-2).real
        # ifft carries 1/new_l instead of the forward 1/l: rescale.
        return (y * (new_l / l)).astype(x.dtype)


# ---------------------------------------------------------------------------
# Decoders (backbone -> targets). Reference: src/tasks/decoders.py.
# ---------------------------------------------------------------------------


class SequenceDecoder(nn.Module):
    """Restrict the sequence axis, then project (decoders.py:38-143).

    mode: 'last' | 'first' | 'mean' | 'pool' | 'sum' | 'full'
      - 'mean': mean over L (masked by `lengths` when given) -> l_output=1.
      - 'pool': causal running mean, restricted to the last l_output steps
        (the reference's cumsum/arange "pool").
      - 'sum': causal running sum, last l_output steps.
    l_output=0 (default) squeezes the length axis away (classification).
    `lengths` (B,) masks padded suffixes — vectorized, unlike the
    reference's per-sample loop.
    """

    d_output: int | None = None
    l_output: int = 0
    mode: str = "last"

    @nn.compact
    def __call__(self, x, lengths=None):
        b, l, d = x.shape
        lout = max(self.l_output, 1)
        squeeze = self.l_output == 0

        if lengths is not None:
            mask = (jnp.arange(l)[None, :] < lengths[:, None])[..., None]
            x = jnp.where(mask, x, 0.0)

        if self.mode == "last":
            if lengths is not None:
                # Gather the window ending at each sample's true length.
                idx = jnp.clip(
                    lengths[:, None] - lout + jnp.arange(lout)[None, :], 0, l - 1
                )
                y = jnp.take_along_axis(x, idx[..., None], axis=1)
            else:
                y = x[:, l - lout :, :]
        elif self.mode == "first":
            y = x[:, :lout, :]
        elif self.mode == "mean":
            if lengths is not None:
                y = x.sum(axis=1, keepdims=True) / jnp.maximum(
                    lengths[:, None, None], 1
                ).astype(x.dtype)
            else:
                y = x.mean(axis=1, keepdims=True)
            y = jnp.broadcast_to(y, (b, lout, d))
        elif self.mode in ("pool", "sum"):
            csum = jnp.cumsum(x.astype(jnp.float32), axis=1)
            if self.mode == "pool":
                denom = jnp.arange(1, l + 1, dtype=jnp.float32)[None, :, None]
                csum = csum / denom
            y = csum[:, l - lout :, :].astype(x.dtype)
        elif self.mode == "full":
            y = x
            squeeze = False
        else:
            raise ValueError(f"unknown decoder mode {self.mode!r}")

        if squeeze:
            y = y[:, 0, :]
        if self.d_output is not None:
            y = nn.Dense(self.d_output, dtype=jnp.float32, name="proj")(
                y.astype(jnp.float32)
            )
        return y


class RetrievalDecoder(nn.Module):
    """Dual-sequence similarity head for LRA Retrieval/AAN
    (decoders.py:179-250, nli=True variant): the batch carries the two
    documents stacked as (2B, L, D); each is mean/last-pooled to a feature,
    and the classifier sees [u, v, u-v, u*v]."""

    n_classes: int
    d_model: int | None = None
    mode: str = "mean"
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, x, lengths=None):
        feat = SequenceDecoder(mode=self.mode, name="feature")(x, lengths=lengths)
        u, v = jnp.split(feat.astype(jnp.float32), 2, axis=0)
        h = jnp.concatenate([u, v, u - v, u * v], axis=-1)
        d = self.d_model or x.shape[-1]
        h = self.activation(nn.Dense(d, dtype=jnp.float32, name="fc1")(h))
        return nn.Dense(self.n_classes, dtype=jnp.float32, name="fc2")(h)


# ---------------------------------------------------------------------------
# SequenceModel: encoder -> staged mixer blocks (+pool) -> decoder.
# Reference: src/models/sequence/model.py:18-117.
# ---------------------------------------------------------------------------

_ENCODERS = {
    "linear": LinearEncoder,
    "embedding": EmbeddingEncoder,
    "one-hot": OneHotEncoder,
    "position": PositionalEncoder,
    "patch2d": PatchEncoder,
}

_POOLS = {
    "avg": DownAvgPool,
    "linear": DownLinearPool,
    "up-linear": UpLinearPool,
    "spectral": DownSpectralPool,
}

_DECODERS = {
    "sequence": SequenceDecoder,
    "retrieval": RetrievalDecoder,
}


def _make(table, cfg, **kwargs):
    cfg = dict({"_name_": cfg} if isinstance(cfg, str) else cfg)
    cls = table[cfg.pop("_name_")]
    return cls(**{**cfg, **kwargs})


class SequenceModel(nn.Module):
    """Config-composed sequence model over (B, L, ...) inputs.

    encoder/decoder: `_name_`-keyed dicts (tables above). The encoder list
    composes (e.g. [embedding, position]). layer: the mixer config passed to
    lm.Block (`mixer` name + mixer_kwargs). Stages: n_layers blocks, pooled
    by `pool` between stages when n_stages > 1 (the reference's
    n_repeat/pool ladder).
    """

    d_model: int
    n_layers: int = 2
    layer: dict | str = "hyena"
    encoder: Any = "linear"
    decoder: Any = "sequence"
    pool: Any = None
    n_stages: int = 1
    d_inner: int | None = None
    dropout: float = 0.0
    l_max: int | None = None
    n_tokens: int | None = None  # vocab for embedding/one-hot encoders
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, lengths=None):
        encoders = self.encoder if isinstance(self.encoder, (list, tuple)) else [self.encoder]
        for i, enc in enumerate(encoders):
            name = enc if isinstance(enc, str) else enc.get("_name_")
            kw = {"deterministic": deterministic} if name == "position" else {}
            mk = {"d_model": self.d_model}
            if name in ("embedding", "one-hot") and self.n_tokens is not None:
                mk["n_tokens"] = self.n_tokens
            x = _make(_ENCODERS, enc, **mk, name=f"encoder_{i}")(x, **kw)
        x = x.astype(self.dtype)

        layer = dict({"mixer": self.layer} if isinstance(self.layer, str) else self.layer)
        mixer = layer.pop("mixer", layer.pop("_name_", "hyena"))
        mixer_kwargs = layer.pop("mixer_kwargs", layer)
        if self.l_max is not None:
            mixer_kwargs = {"l_max": self.l_max, **mixer_kwargs}

        blocks_per_stage = max(self.n_layers // max(self.n_stages, 1), 1)
        idx = 0
        for stage in range(max(self.n_stages, 1)):
            for _ in range(blocks_per_stage):
                x = Block(
                    d_model=x.shape[-1],
                    d_inner=self.d_inner or 4 * x.shape[-1],
                    mixer=mixer,
                    mixer_kwargs=mixer_kwargs,
                    resid_dropout=self.dropout,
                    name=f"block_{idx}",
                )(x, deterministic=deterministic)
                idx += 1
            if self.pool is not None and stage < self.n_stages - 1:
                x = _make(_POOLS, self.pool, name=f"pool_{stage}")(x)
                if self.l_max is not None and "l_max" in mixer_kwargs:
                    pool_cfg = (
                        {"_name_": self.pool} if isinstance(self.pool, str) else self.pool
                    )
                    stride = pool_cfg.get("stride", 2)
                    mixer_kwargs = {
                        **mixer_kwargs, "l_max": mixer_kwargs["l_max"] // stride
                    }

        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_f")(x.astype(jnp.float32)).astype(self.dtype)
        return _make(_DECODERS, self.decoder, name="decoder")(x, lengths=lengths)
