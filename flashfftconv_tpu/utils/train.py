"""Training utilities: train state, steps, checkpointing.

Covers the training mechanics of the reference's standalone CIFAR script
(/root/reference/standalone_cifar.py: AdamW + cosine schedule + per-param
groups, bf16 autocast, checkpoint save/resume) in JAX idiom: optax, explicit
rngs for dropout, orbax for checkpoints.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params)
    )


def cross_entropy_loss(logits, labels):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32))
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()


def make_train_step(apply_fn: Callable, tx: optax.GradientTransformation):
    """Returns a jittable train step: (state, batch, rng) -> (state, metrics)."""

    def step(state: TrainState, batch, rng):
        x, y = batch
        dropout_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            logits = apply_fn(
                {"params": params}, x, deterministic=False,
                rngs={"dropout": dropout_rng},
            )
            loss = cross_entropy_loss(logits, y)
            acc = (logits.argmax(-1) == y).mean()
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params, opt_state=opt_state)
        return new_state, {"loss": loss, "accuracy": acc}

    return step


def make_eval_step(apply_fn: Callable):
    def step(params, batch):
        x, y = batch
        logits = apply_fn({"params": params}, x, deterministic=True)
        return {
            "loss": cross_entropy_loss(logits, y),
            "correct": (logits.argmax(-1) == y).sum(),
            "total": jnp.asarray(y.shape[0]),
        }

    return step


def save_checkpoint(path: str, state: TrainState, extra: dict | None = None):
    """Orbax checkpoint save (the reference's torch.save equivalent,
    standalone_cifar.py:262-274). Works with sharded arrays."""
    import orbax.checkpoint as ocp

    ckpt = {"state": state}
    if extra:
        ckpt["extra"] = extra
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, ckpt, force=True)


def restore_checkpoint(path: str, state: TrainState, extra: dict | None = None):
    import orbax.checkpoint as ocp

    target = {"state": state}
    if extra is not None:
        target["extra"] = extra
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, target)
    return restored["state"], restored.get("extra")
