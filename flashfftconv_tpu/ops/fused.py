"""Fused pointwise building blocks.

API-parity layer for the reference's vendored fused-op CUDA extensions
(SURVEY.md §2.6 ⚙ rows: fused_dense_lib, layer_norm, fused_softmax, rotary,
xentropy). On TPU these are plain compositions — XLA fuses them into single
kernels — so the value here is a stable, named API surface with the exact
semantics of the reference ops, not hand-written kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dense_bias_gelu(x, w, b):
    """FusedDense + GeLU (csrc/fused_dense_lib): one matmul with the bias+gelu
    epilogue fused by XLA."""
    y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    return jax.nn.gelu(y + b.astype(jnp.float32)).astype(x.dtype)


def dropout_add_layer_norm(
    x, residual, weight, bias, dropout_rate, rng=None, deterministic=True,
    eps: float = 1e-5, prenorm: bool = False,
):
    """Fused dropout + residual add + LayerNorm (csrc/layer_norm): returns
    normed output (and the pre-norm residual when prenorm=True, matching the
    reference's residual_in_fp32 pattern)."""
    h = x.astype(jnp.float32)
    if not deterministic and dropout_rate > 0:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, x.shape)
        h = jnp.where(keep, h / (1.0 - dropout_rate), 0.0)
    res = h if residual is None else h + residual.astype(jnp.float32)
    mean = res.mean(-1, keepdims=True)
    var = ((res - mean) ** 2).mean(-1, keepdims=True)
    out = (res - mean) * jax.lax.rsqrt(var + eps)
    out = out * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    out = out.astype(x.dtype)
    return (out, res) if prenorm else out


def scaled_masked_softmax(scores, mask=None, scale: float = 1.0):
    """Fused scale+mask+softmax (csrc/fused_softmax)."""
    s = scores.astype(jnp.float32) * scale
    if mask is not None:
        s = jnp.where(mask, s, -1e9)
    return jax.nn.softmax(s, axis=-1).astype(scores.dtype)


def apply_rotary_emb(x, cos, sin):
    """Rotary position embedding apply (csrc/rotary). x: (..., L, D) with the
    rotation over the last dim's interleaved halves; cos/sin: (L, D/2)."""
    d = x.shape[-1]
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    cos = cos.astype(jnp.float32)
    sin = sin.astype(jnp.float32)
    x1f, x2f = x1.astype(jnp.float32), x2.astype(jnp.float32)
    return jnp.concatenate(
        [x1f * cos - x2f * sin, x2f * cos + x1f * sin], axis=-1
    ).astype(x.dtype)


def cross_entropy_loss(logits, labels, ignore_index: int = -100,
                       label_smoothing: float = 0.0):
    """Parallel cross entropy (csrc/xentropy semantics): ignore_index masking
    + optional label smoothing, f32 internally. In a TP mesh, shard the vocab
    axis and GSPMD handles the logit gather/reduction."""
    v = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = jnp.maximum(labels, 0)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    if label_smoothing > 0:
        smooth = -logp.mean(-1)
        nll = (1 - label_smoothing) * nll + label_smoothing * smooth
    mask = (labels != ignore_index).astype(jnp.float32)
    return (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)
