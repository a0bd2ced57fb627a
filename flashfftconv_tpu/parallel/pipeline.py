"""SPMD pipeline parallelism (GPipe schedule) over a mesh axis.

The reference has NO pipeline parallelism anywhere (SURVEY.md §2.6: "pipeline
parallelism ... NOT present") — its largest models train with DP/TP/SP only.
This module goes past that: the LM's homogeneous block stack is split into P
stages laid out over a `pp` mesh axis, and microbatches stream through the
stages with `lax.ppermute` hops inside a `lax.scan`, the idiomatic TPU
formulation (one program, XLA overlaps the ICI hop with the next tick's
compute; no host scheduler, no NCCL send/recv graph).

Design:
  - Per-stage parameters are a single pytree whose leaves carry a leading
    stage dimension S == mesh.shape[axis], sharded over `axis` — each device
    holds exactly its stage's slice (the pipeline analog of ZeRO: parameter
    memory scales 1/P).
  - The schedule is GPipe: T = M + S - 1 ticks for M microbatches; every
    device runs `stage_fn` each tick (bubble fraction (S-1)/T). Gradients
    flow through scan+ppermute transposes, giving the reverse pipeline in
    backward automatically — no hand-written 1F1B needed for correctness.
  - Stage inputs/outputs must have the same shape/dtype (residual-stream
    models: embeddings and head live outside the pipelined segment).

Differentiable end-to-end; compose with dp/tp/ep by adding those axes to the
same mesh (the stage dimension only consumes the `pp` axis).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


def stack_stage_params(param_trees: list):
    """Stack S per-stage parameter pytrees (identical structure) into one
    pytree with a leading stage dimension, ready for `pipeline_apply`."""
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *param_trees)


def stage_param_shardings(mesh: Mesh, stage_params, axis: str = "pp"):
    """NamedSharding pytree placing each leaf's leading stage dim on `axis`."""
    from jax.sharding import NamedSharding

    def one(leaf):
        spec = [None] * leaf.ndim
        spec[0] = axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(one, stage_params)


def pipeline_apply(
    stage_fn: Callable,
    stage_params,
    x: jax.Array,
    mesh: Mesh,
    axis: str = "pp",
    num_microbatches: int | None = None,
    batch_axis: str | None = None,
):
    """Run x through S pipelined stages: y = f_{S-1}(... f_1(f_0(x))).

    Args:
      stage_fn: (params_slice, x_mb) -> y_mb with y_mb.shape == x_mb.shape
        and same dtype (a residual-stream segment, e.g. a run of LM blocks).
      stage_params: pytree whose leaves have leading dim S == mesh.shape[axis]
        (build with `stack_stage_params`; shard with `stage_param_shardings`).
      x: (B, ...) global batch. B % num_microbatches == 0.
      num_microbatches: M; defaults to S. Larger M shrinks the pipeline
        bubble ((S-1)/(M+S-1)) at the cost of smaller per-tick matmuls.
      batch_axis: optional mesh axis carrying the batch (data parallelism):
        each dp group then runs an independent pipeline over its batch shard
        (B and the microbatch split refer to the per-group shard).

    Returns:
      (B, ...) output, replicated over `axis`, sharded over `batch_axis` if
      given (this function only consumes the `pp` axis otherwise).
    """
    s_total = mesh.shape[axis]
    m = num_microbatches or s_total
    b = x.shape[0] // (mesh.shape[batch_axis] if batch_axis else 1)
    if b % m:
        raise ValueError(f"per-group batch {b} not divisible into {m} microbatches")
    mb = b // m

    def local(params_loc, x_all):
        # shard_map gives the stage slice with a leading dim of 1.
        params_loc = jax.tree.map(lambda a: jnp.squeeze(a, 0), params_loc)
        sid = lax.axis_index(axis)
        xs = x_all.reshape(m, mb, *x_all.shape[1:])
        ticks = m + s_total - 1

        def tick(carry, t):
            buf, out = carry
            # Stage 0 picks up microbatch t (clipped; post-M ticks feed a
            # stale row whose result never reaches the last stage in time).
            fresh = lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, m - 1), 0, keepdims=False
            )
            inp = jnp.where(sid == 0, fresh, buf)
            y = stage_fn(params_loc, inp)
            # The last stage's tick-t output is microbatch t-(S-1).
            oidx = jnp.clip(t - (s_total - 1), 0, m - 1)
            prev_row = lax.dynamic_index_in_dim(out, oidx, 0, keepdims=False)
            row = jnp.where((sid == s_total - 1) & (t >= s_total - 1), y, prev_row)
            out = lax.dynamic_update_index_in_dim(out, row, oidx, 0)
            # Hand this tick's activation to the next stage.
            nxt = lax.ppermute(
                y, axis, [(i, i + 1) for i in range(s_total - 1)]
            )
            return (nxt, out), None

        # The carry varies per-device (each stage holds different data), but
        # the zero init is replicated — mark it varying over the pipe axis so
        # scan's carry types match (shard_map's varying-manual-axes tracking).
        buf0 = lax.pcast(jnp.zeros_like(xs[0]), (axis,), to="varying")
        out0 = lax.pcast(jnp.zeros_like(xs), (axis,), to="varying")
        (_, out), _ = lax.scan(tick, (buf0, out0), jnp.arange(ticks))
        # Only the last stage holds real outputs; replicate over the axis.
        out = lax.psum(jnp.where(sid == s_total - 1, out, jnp.zeros_like(out)), axis)
        return out.reshape(x_all.shape)

    stage_specs = jax.tree.map(
        lambda leaf: P(*([axis] + [None] * (leaf.ndim - 1))), stage_params
    )
    x_spec = P(batch_axis) if batch_axis else P()
    fn = jax.shard_map(
        local, mesh=mesh, in_specs=(stage_specs, x_spec), out_specs=x_spec
    )
    return fn(stage_params, x)
