"""Optimizer construction with per-parameter hyperparameter groups.

The reference tags conv-kernel parameters with an ``_optim`` attribute (custom
lr, zero weight decay) and builds AdamW param groups from it
(/root/reference/flashfftconv_long_convs.py:16-29,
standalone_cifar.py:145-186). The optax-native equivalent is
``optax.multi_transform`` over a label pytree.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax


def label_params(params, is_special: Callable[[tuple, Any], bool]):
    """Label each leaf 'special' or 'default' based on its path."""

    def lab(path, leaf):
        del leaf
        return "special" if is_special(path) else "default"

    return jax.tree_util.tree_map_with_path(lab, params)


def kernel_label_fn(path) -> bool:
    """True for long-conv kernel parameters (the reference's `_optim` params)."""
    names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    return any(n == "kernel" for n in names)


def make_optimizer(
    params,
    lr: float = 1e-3,
    weight_decay: float = 0.05,
    special_lr: float | None = 1e-3,
    epochs: int | None = None,
    steps_per_epoch: int | None = None,
    warmup_steps: int = 0,
    is_special: Callable = kernel_label_fn,
) -> optax.GradientTransformation:
    """AdamW with a separate no-weight-decay group for kernel params, and an
    optional cosine schedule (the reference uses CosineAnnealingLR over epochs,
    standalone_cifar.py:177). ``warmup_steps`` prepends a linear warmup (the
    reference's LRA/Hyena configs warm up before the cosine; without it a
    postnorm stack at full lr can collapse into the class-prior basin in the
    first few hundred steps and never leave — the round-5 listops failure)."""

    def sched(base):
        if epochs is None or steps_per_epoch is None:
            if not warmup_steps:
                return base
            return optax.linear_schedule(0.0, base, warmup_steps)
        total = epochs * steps_per_epoch
        if not warmup_steps:
            return optax.cosine_decay_schedule(base, total)
        return optax.warmup_cosine_decay_schedule(
            0.0, base, warmup_steps, max(total, warmup_steps + 1))

    default_tx = optax.adamw(sched(lr), weight_decay=weight_decay)
    special_tx = optax.adamw(sched(special_lr if special_lr is not None else lr),
                             weight_decay=0.0)
    labels = label_params(params, is_special)
    return optax.multi_transform(
        {"default": default_tx, "special": special_tx}, labels
    )


def ema_init(params):
    """EMA of parameters (the reference harness's EMACallback,
    examples/hyena/src/callbacks/ema.py:16): shadow copy in f32."""
    return jax.tree_util.tree_map(lambda p: p.astype(jnp.float32), params)


def ema_update(ema, params, decay: float = 0.999):
    """One EMA step: shadow <- decay*shadow + (1-decay)*params. Jittable."""
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p.astype(jnp.float32), ema, params
    )


def ema_swap(ema, params):
    """Cast the shadow params back to the live params' dtypes (for eval)."""
    return jax.tree_util.tree_map(lambda e, p: e.astype(p.dtype), ema, params)
