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
from jax import lax


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


def rms_norm(x, weight, eps: float = 1e-5):
    """RMSNorm (flash_attn/ops/rms_norm.py): x / rms(x) * weight, no mean
    subtraction and no bias, f32 internally."""
    h = x.astype(jnp.float32)
    ms = (h * h).mean(-1, keepdims=True)
    return (h * jax.lax.rsqrt(ms + eps) * weight.astype(jnp.float32)).astype(x.dtype)


def dropout_add_rms_norm(
    x, residual, weight, dropout_rate, rng=None, deterministic=True,
    eps: float = 1e-5, prenorm: bool = False,
):
    """Fused dropout + residual add + RMSNorm
    (flash_attn/ops/rms_norm.py::dropout_add_rms_norm)."""
    h = x.astype(jnp.float32)
    if not deterministic and dropout_rate > 0:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, x.shape)
        h = jnp.where(keep, h / (1.0 - dropout_rate), 0.0)
    res = h if residual is None else h + residual.astype(jnp.float32)
    out = rms_norm(res, weight, eps=eps).astype(x.dtype)
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


def vocab_parallel_cross_entropy(
    logits,
    labels,
    mesh,
    axis: str = "tp",
    ignore_index: int = -100,
    label_smoothing: float = 0.0,
):
    """Cross entropy over vocab-sharded logits WITHOUT gathering the vocab —
    the reference's TP-aware xentropy kernel
    (csrc/xentropy, tests/losses/test_cross_entropy_parallel.py): each device
    holds logits (..., V/P) for its vocab slice; the log-sum-exp and the
    target logit are assembled with one psum each (the max shift is a pmax of
    scalars). Peak memory stays O(V/P) per device instead of the O(V)
    all-gather a naive GSPMD matmul+softmax would insert.

    Args:
      logits: (..., V) global array, sharded (or shardable) over `axis` on
        the last dim.
      labels: (...) int labels in [0, V), replicated.
      mesh: the device mesh; `axis` is its tensor-parallel axis.
    """

    def local(lg, lb):
        p = lax.axis_size(axis)
        vloc = lg.shape[-1]
        off = lax.axis_index(axis) * vloc
        lg = lg.astype(jnp.float32)
        # Stability shift: mathematically cancels in lse, so stop_gradient
        # keeps AD exact. all_gather of the P per-device scalar maxes rather
        # than pmax — pmax has no JVP rule, all_gather does.
        gmax = lax.stop_gradient(lax.all_gather(lg.max(-1), axis).max(0))
        se = jnp.exp(lg - gmax[..., None]).sum(-1)
        lse = jnp.log(lax.psum(se, axis)) + gmax
        tgt = jnp.maximum(lb, 0)
        in_range = (tgt >= off) & (tgt < off + vloc)
        tl = jnp.take_along_axis(
            lg, jnp.where(in_range, tgt - off, 0)[..., None], axis=-1
        )[..., 0]
        tgt_logit = lax.psum(jnp.where(in_range, tl, 0.0), axis)
        nll = lse - tgt_logit
        if label_smoothing > 0:
            mean_logit = lax.psum(lg.sum(-1), axis) / (p * vloc)
            smooth = lse - mean_logit
            nll = (1 - label_smoothing) * nll + label_smoothing * smooth
        mask = (lb != ignore_index).astype(jnp.float32)
        val = (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        # val is already identical on every tp device (everything upstream is
        # psum'd); the pmean just makes that replication explicit for the
        # out_specs checker. Scalar, so the collective is free.
        return lax.pmean(val, axis)

    from jax.sharding import PartitionSpec as P

    nb = logits.ndim - 1
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(*([None] * nb), axis), P(*([None] * labels.ndim))),
        out_specs=P(),
    )(logits, labels)
