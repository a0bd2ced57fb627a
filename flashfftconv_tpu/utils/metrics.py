"""Training metrics + monitors.

Functional equivalents of the reference's torchmetrics-based task metrics
(/root/reference/examples/hyena/src/tasks/metrics.py, training/src/metrics/)
and its callback monitors (SpeedMonitor, NormMonitor — SURVEY.md §5.1/§5.5):
cross-entropy / perplexity / accuracy / num-tokens, plus param/grad norm
computation and a simple step-rate tracker.
"""

from __future__ import annotations

import functools
import time
from typing import Any

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def cross_entropy(logits, targets, ignore_index: int | None = None):
    """Mean token NLL with a recompute-in-backward VJP.

    The default AD of log_softmax keeps the f32 log-probabilities alive from
    the forward head across the ENTIRE model backward (32 MB at L=1M vocab 8,
    and it scales with B*L*V) because the loss gradient needs them last. This
    VJP saves only the (typically bf16) logits — an activation that exists
    anyway — and recomputes softmax inside the backward of the loss itself.
    Gradient is exact: d_logits = (softmax(logits) - onehot) * weight.
    """
    return _xent_value(logits, targets, ignore_index)


def _xent_value(logits, targets, ignore_index):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if ignore_index is not None:
        mask = (targets != ignore_index).astype(jnp.float32)
        return (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)
    return nll.mean()


def _xent_fwd(logits, targets, ignore_index):
    return _xent_value(logits, targets, ignore_index), (logits, targets)


def _xent_bwd(ignore_index, res, g):
    logits, targets = res
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    oh = jax.nn.one_hot(targets, logits.shape[-1], dtype=jnp.float32)
    d = p - oh
    if ignore_index is not None:
        mask = (targets != ignore_index).astype(jnp.float32)
        d = d * mask[..., None] / jnp.maximum(mask.sum(), 1.0)
    else:
        d = d / targets.size
    return ((g * d).astype(logits.dtype), None)


cross_entropy.defvjp(_xent_fwd, _xent_bwd)


def perplexity(logits, targets, ignore_index: int | None = None):
    return jnp.exp(cross_entropy(logits, targets, ignore_index))


def accuracy(logits, targets, ignore_index: int | None = None):
    pred = logits.argmax(-1)
    correct = (pred == targets).astype(jnp.float32)
    if ignore_index is not None:
        mask = (targets != ignore_index).astype(jnp.float32)
        return (correct * mask).sum() / jnp.maximum(mask.sum(), 1.0)
    return correct.mean()


def num_tokens(targets, ignore_index: int | None = None):
    if ignore_index is None:
        return jnp.asarray(targets.size)
    return (targets != ignore_index).sum()


def global_norm(tree) -> jax.Array:
    """L2 norm over a pytree (NormMonitor analog)."""
    leaves = [jnp.sum(jnp.square(x.astype(jnp.float32))) for x in jax.tree_util.tree_leaves(tree)]
    return jnp.sqrt(sum(leaves))


def param_and_grad_norms(params, grads) -> dict[str, jax.Array]:
    return {"param_norm": global_norm(params), "grad_norm": global_norm(grads)}


class SpeedMonitor:
    """Wall-clock step/throughput tracker (the reference's SpeedMonitor
    callback, training/src/callbacks/speed_monitor.py:12-89)."""

    def __init__(self):
        self._last = None
        self.inter_step_ms = 0.0

    def step(self, n_items: int = 0) -> dict[str, float]:
        now = time.perf_counter()
        out = {}
        if self._last is not None:
            dt = now - self._last
            out["step_time_ms"] = dt * 1e3
            if n_items:
                out["items_per_sec"] = n_items / dt
        self._last = now
        return out


def param_counts(params) -> dict[str, int]:
    """Total and per-top-level-module parameter counts — the reference's
    ParamsLog callback (training/src/callbacks/params_log.py; in JAX the
    whole param tree is trainable, so total == trainable)."""
    import jax

    counts = {"total": sum(x.size for x in jax.tree.leaves(params))}
    if isinstance(params, dict):
        for k, v in params.items():
            counts[k] = sum(x.size for x in jax.tree.leaves(v))
    return counts
