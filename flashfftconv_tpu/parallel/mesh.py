"""Device-mesh parallelism helpers (DP / TP / SP) — the TPU-native equivalent
of the reference's entire NCCL/apex/Lightning distributed stack (SURVEY.md
§2.6, §5.8): data parallelism (DDP/ZeRO), Megatron tensor parallelism
(Column/RowParallelLinear) and Megatron sequence parallelism all become
sharding annotations over a jax.sharding.Mesh; XLA GSPMD inserts the
collectives (psum/all-gather/reduce-scatter) over ICI.

Long sequences stay on-chip via the Monarch decomposition (as in the
reference); the mesh shards batch ('dp') and channels/heads ('tp') — the
depthwise conv is embarrassingly parallel over H, which is how the TPU build
escapes the reference's B/H memory caps at large N (SURVEY.md §5.7).
"""

from __future__ import annotations

import re
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_sizes: Sequence[int] | None = None,
    axis_names: Sequence[str] = ("dp", "tp"),
    devices=None,
) -> Mesh:
    """Create a Mesh over the available devices.

    With the default axis_sizes=None, ALL devices go to the first axis
    (typically 'dp') and every other axis gets size 1. Pass explicit
    axis_sizes for tp/pp/ep splits; their product must equal the device
    count.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(axis_sizes)) != n:
        raise ValueError(f"axis sizes {axis_sizes} do not cover {n} devices")
    dev_array = np.asarray(devices).reshape(*axis_sizes)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0, dp_axis: str = "dp"):
    """NamedSharding that shards only the batch dimension over 'dp'."""
    spec = [None] * ndim
    spec[batch_axis] = dp_axis
    return NamedSharding(mesh, P(*spec))


# Default tensor-parallel sharding rules for model parameters, keyed by
# regex on the flattened param path. Mirrors Megatron TP: Dense kernels are
# column-parallel (output dim sharded), conv kernels shard channels H.
DEFAULT_TP_RULES: tuple[tuple[str, tuple[str | None, ...]], ...] = (
    (r".*output_linear.*kernel$", (None, "tp")),   # Dense (in, out) -> column-parallel
    (r".*layer_\d+/kernel$", (None, "tp", None)),  # long-conv kernel (C, H, 2L)
    (r".*layer_\d+/D$", (None, "tp")),             # skip weights (C, H)
    # Megatron attention/MLP TP (the reference's ColumnParallelLinear /
    # RowParallelLinear pairs, flash_attn/ops/fused_dense.py:148-186):
    # qkv and fc1 column-parallel, out_proj and fc2 row-parallel, so the
    # block needs one collective pair per sublayer under GSPMD.
    (r".*mixer/qkv_proj/kernel$", (None, "tp")),
    (r".*mixer/qkv_proj/bias$", ("tp",)),
    (r".*mixer/out_proj/kernel$", ("tp", None)),
    (r".*mlp/fc1/kernel$", (None, "tp")),
    (r".*mlp/fc1/bias$", ("tp",)),
    (r".*mlp/fc2/kernel$", ("tp", None)),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "name", getattr(p, "idx", p)))))
    return "/".join(parts)


def param_shardings(mesh: Mesh, params, rules=DEFAULT_TP_RULES):
    """Build a NamedSharding pytree for params: TP rules where they match,
    fully replicated otherwise."""

    def shard_one(path, leaf):
        ps = _path_str(path)
        for pattern, spec in rules:
            if re.match(pattern, ps) and len(spec) == leaf.ndim:
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(shard_one, params)


def zero1_shardings(mesh: Mesh, opt_state, dp_axis: str = "dp"):
    """ZeRO-1 analog (the reference's DDPStrategyZero1,
    training/src/utils/ddp_zero1.py:57): shard optimizer-state tensors over
    the data-parallel axis. Each moment tensor's largest dp-divisible
    dimension is sharded; scalars and indivisible tensors stay replicated.
    GSPMD handles the gather/scatter around the update — no rank-local
    state-dict consolidation needed (orbax saves sharded arrays natively).
    """
    dp = mesh.shape[dp_axis]

    def shard_one(leaf):
        if not hasattr(leaf, "ndim") or leaf.ndim == 0:
            return NamedSharding(mesh, P())
        for axis in range(leaf.ndim):
            if leaf.shape[axis] % dp == 0 and leaf.shape[axis] >= dp:
                spec = [None] * leaf.ndim
                spec[axis] = dp_axis
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(shard_one, opt_state)


def zero2_shardings(mesh: Mesh, tree, dp_axis: str = "dp"):
    """ZeRO-2 analog (the reference's DDPStrategyZero2 / apex
    DistributedFusedAdam, training/src/utils/ddp_zero2.py:68): shard the
    *gradients* over the data-parallel axis in addition to the ZeRO-1
    optimizer-state sharding. Constraining grads to this sharding inside the
    train step makes GSPMD lower the DP gradient all-reduce to a
    reduce-scatter, so each device holds only its 1/dp grad shard while the
    sharded optimizer update runs, exactly the ZeRO-2 memory shape.

    Returns a NamedSharding pytree matching `tree` (grads or params): each
    tensor's largest dp-divisible dimension is sharded, scalars and
    indivisible tensors stay replicated. Pass to
    ``jax.lax.with_sharding_constraint(grads, zero2_shardings(mesh, grads))``
    or via utils.train.make_train_step(grad_shardings=...).
    """
    return zero1_shardings(mesh, tree, dp_axis=dp_axis)


def sequence_sharding(mesh: Mesh, ndim: int, seq_axis: int = -1, sp_axis: str = "tp"):
    """Megatron-style sequence parallelism for pointwise blocks: shard the
    sequence axis (the conv itself is never sequence-sharded, matching the
    reference; SURVEY.md §2.6)."""
    spec = [None] * ndim
    spec[seq_axis % ndim] = sp_axis
    return NamedSharding(mesh, P(*spec))
