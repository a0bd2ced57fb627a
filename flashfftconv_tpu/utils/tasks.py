"""Task bundles: loss + metrics (+ default decoder shape) per task kind.

Functional analog of the reference's task classes
(/root/reference/examples/hyena/src/tasks/tasks.py: BaseTask/LMTask/
ForecastingTask — loss function, metric set, and the encoder/decoder the
task expects). In JAX the task is just data: a named bundle of pure
functions the train step closes over; no Lightning module or stateful
torchmetrics needed (every metric here is a one-shot reduction — epoch
aggregation is a mean over step values in the train loop).

Usage:
    task = get_task("classification")
    loss = task.loss(logits, labels)
    metrics = {k: f(logits, labels) for k, f in task.metrics.items()}
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import jax.numpy as jnp

from flashfftconv_tpu.utils import metrics as M


@dataclass(frozen=True)
class Task:
    """A loss plus named metric reductions; `decoder_mode` is the
    SequenceDecoder mode the task conventionally pairs with."""

    loss: Callable
    metrics: dict[str, Callable] = field(default_factory=dict)
    decoder_mode: str = "last"


def _mse(pred, target):
    return jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)


def _mae(pred, target):
    return jnp.mean(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def _shifted_xent(logits, targets, ignore_index: int = -100):
    """Next-token LM loss: predict targets[t+1] from logits[t] (the
    reference LMTask shifts inside the dataloader; shifting here keeps the
    example loops one-liner)."""
    return M.cross_entropy(logits[:, :-1], targets[:, 1:], ignore_index)


TASKS: dict[str, Task] = {
    # Autoregressive LM over pre-shifted (input, target) pairs.
    "lm": Task(
        loss=M.cross_entropy,
        metrics={"ppl": M.perplexity, "acc": M.accuracy},
        decoder_mode="full",
    ),
    # LM where the batch is a single token stream (shift internally).
    "lm-shift": Task(
        loss=_shifted_xent,
        metrics={
            "ppl": lambda lg, tg: M.perplexity(lg[:, :-1], tg[:, 1:]),
            "acc": lambda lg, tg: M.accuracy(lg[:, :-1], tg[:, 1:]),
        },
        decoder_mode="full",
    ),
    "classification": Task(
        loss=M.cross_entropy,
        metrics={"acc": M.accuracy},
        decoder_mode="mean",
    ),
    "multilabel": Task(
        loss=lambda lg, tg: jnp.mean(
            jnp.clip(lg, 0) - lg * tg + jnp.log1p(jnp.exp(-jnp.abs(lg)))
        ),
        metrics={
            "acc": lambda lg, tg: jnp.mean(((lg > 0) == (tg > 0.5)).astype(jnp.float32))
        },
        decoder_mode="mean",
    ),
    "regression": Task(
        loss=_mse, metrics={"mse": _mse, "mae": _mae}, decoder_mode="last"
    ),
    # Multi-horizon forecasting: predictions (B, l_output, D) vs targets.
    "forecasting": Task(
        loss=_mse, metrics={"mse": _mse, "mae": _mae}, decoder_mode="pool"
    ),
}


def get_task(name: str) -> Task:
    try:
        return TASKS[name]
    except KeyError:
        raise KeyError(f"unknown task {name!r}; known: {sorted(TASKS)}") from None
