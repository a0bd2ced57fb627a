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


def make_train_step(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    grad_shardings=None,
):
    """Returns a jittable train step: (state, batch, rng) -> (state, metrics).

    grad_shardings: optional NamedSharding pytree (parallel.mesh
    zero2_shardings) constraining the gradients — the ZeRO-2 analog: GSPMD
    then reduce-scatters grads over dp instead of all-reducing, and the
    sharded optimizer update consumes the local shard.
    """

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
        if grad_shardings is not None:
            grads = jax.lax.with_sharding_constraint(grads, grad_shardings)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params, opt_state=opt_state)
        return new_state, {"loss": loss, "accuracy": acc}

    return step


def make_eval_step(apply_fn: Callable):
    """Classification eval step. ``batch`` is ``(x, y)`` or ``(x, y, w)``
    where ``w`` is a 0/1 per-row weight masking padded rows out of the
    counts (see :func:`evaluate`)."""

    def step(params, batch):
        x, y, *rest = batch
        w = rest[0].astype(jnp.float32) if rest else jnp.ones(
            y.shape[0], jnp.float32)
        logits = apply_fn({"params": params}, x, deterministic=True)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        nll = -jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]
        return {
            "loss": (nll * w).sum() / jnp.maximum(w.sum(), 1.0),
            "correct": ((logits.argmax(-1) == y).astype(jnp.float32) * w).sum(),
            "total": w.sum(),
        }

    return step


def evaluate(eval_step, params, arrays, batch_size: int):
    """Run ``eval_step`` over every row of ``arrays`` (a tuple of arrays
    sharing their leading axis, e.g. ``(val_x, val_y)``), returning
    ``(correct, total)``.

    The final partial batch is padded to ``batch_size`` (no jit recompile)
    with the pad rows masked out via the step's weight argument. Raises on an
    empty split — the previous per-example ``range(0, n - bs + 1, bs)`` loops
    silently evaluated NOTHING when the split was smaller than the batch and
    logged 0% as a measurement (the round-4 listops artifact)."""
    import numpy as np

    n = len(arrays[-1])
    if n == 0:
        raise ValueError("evaluate(): empty eval split")
    correct = total = 0.0
    for i in range(0, n, batch_size):
        rows = [np.asarray(a[i : i + batch_size]) for a in arrays]
        w = np.ones(len(rows[-1]), np.float32)
        if len(w) < batch_size:
            pad = batch_size - len(w)
            rows = [np.concatenate([r, np.repeat(r[:1], pad, axis=0)]) for r in rows]
            w = np.concatenate([w, np.zeros(pad, np.float32)])
        m = eval_step(params, tuple(jnp.asarray(r) for r in rows) + (jnp.asarray(w),))
        correct += float(m["correct"])
        total += float(m["total"])
    assert total > 0, "evaluate(): zero rows counted"
    return correct, total


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


AUTO_SAVE_NAME = "auto_save"


class auto_save_on_exception:
    """Fault-tolerance hook: save an emergency checkpoint when the training
    loop dies (the reference's ModelCheckpointMine.on_exception writing
    .pl_auto_save.ckpt, training/src/callbacks/model_checkpoint.py:8-17).

    Usage::

        guard = auto_save_on_exception(ckpt_dir)
        with guard:
            for batch in loader:
                state, metrics = train_step(state, batch, rng)
                guard.track(state, extra={"epoch": epoch})

    On an exception (including KeyboardInterrupt) the last tracked state is
    written to <ckpt_dir>/auto_save; the exception then propagates. Pair
    with :func:`latest_checkpoint` on resume, which prefers the newer of the
    regular and auto-save checkpoints (reference training/src/train.py:69-92).
    """

    def __init__(self, ckpt_dir: str):
        import os

        self.path = os.path.abspath(os.path.join(ckpt_dir, AUTO_SAVE_NAME))
        self._state = None
        self._extra = None

    def track(self, state: TrainState, extra: dict | None = None):
        self._state = state
        self._extra = extra

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is not None and self._state is not None:
            try:
                save_checkpoint(self.path, jax.device_get(self._state), self._extra)
                print(f"auto-saved checkpoint to {self.path}", flush=True)
            except Exception as save_err:  # don't mask the original exception
                print(f"auto-save failed: {save_err!r}", flush=True)
        return False  # propagate


def latest_checkpoint(ckpt_dir: str, name: str = "last") -> str | None:
    """Path of the newest checkpoint in ckpt_dir, preferring the auto-save
    when it is more recent than the regular one (reference resume logic,
    training/src/train.py:69-92)."""
    import os

    candidates = []
    for n in (name, AUTO_SAVE_NAME):
        p = os.path.abspath(os.path.join(ckpt_dir, n))
        if os.path.isdir(p):
            candidates.append((os.path.getmtime(p), p))
    return max(candidates)[1] if candidates else None


class ProgressiveResizing:
    """Sequence-resolution curriculum over training epochs.

    TPU-native analog of the reference's ProgressiveResizing callback
    (/root/reference/examples/hyena/src/callbacks/progressive_resizing.py):
    train early epochs on subsampled (shorter) sequences, later epochs at
    full resolution. stage_params is the same schema —
    ``[{"resolution": 4, "epochs": 50}, {"resolution": 2, "epochs": 30},
    {"resolution": 1, "epochs": 20}, ...]`` with optional per-stage
    ``"bandlimit"`` (anti-alias the learned conv kernels, see
    models.h3.LongConvKernel) and ``"lr_scale"`` (the reference's per-stage
    scheduler override reduced to its useful core).

    There is no Lightning trainer to mutate: the train loop asks
    ``stage_of(epoch)`` each epoch, subsamples batches with
    ``downsample(x)``, and rebuilds its jitted step when ``boundary(epoch)``
    is True — a shape change means one fresh XLA compile per stage, which is
    exactly how jit wants it. Resumption lands in the right stage because
    stage_of is a pure function of the epoch (the reference's searchsorted
    dance, progressive_resizing.py:47-48).
    """

    def __init__(self, stage_params: list[dict]):
        assert stage_params, "No stages specified"
        assert all({"resolution", "epochs"} <= set(s) for s in stage_params), \
            "stage_params must contain keys: resolution and epochs"
        self.stage_params = list(stage_params)
        self._cume = []
        tot = 0
        for s in stage_params:
            tot += s["epochs"]
            self._cume.append(tot)
        self.total_epochs = tot

    def stage_of(self, epoch: int) -> int:
        for i, hi in enumerate(self._cume):
            if epoch < hi:
                return i
        return len(self.stage_params) - 1

    def boundary(self, epoch: int) -> bool:
        """True when `epoch` starts a new stage (recompile/rebuild point)."""
        return epoch == 0 or any(epoch == hi for hi in self._cume[:-1])

    def params_at(self, epoch: int) -> dict:
        return self.stage_params[self.stage_of(epoch)]

    def downsample(self, x, epoch: int):
        """Subsample the sequence axis (axis 1 of (B, L, ...) or (B, L))
        by the stage's resolution — the reference's train_resolution
        dataloader knob."""
        r = int(self.params_at(epoch)["resolution"])
        return x if r == 1 else x[:, ::r]

    def lr_scale(self, epoch: int) -> float:
        return float(self.params_at(epoch).get("lr_scale", 1.0))

    def bandlimit(self, epoch: int):
        return self.params_at(epoch).get("bandlimit")
