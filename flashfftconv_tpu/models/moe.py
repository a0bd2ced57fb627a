"""Mixture-of-Experts MLP with expert parallelism over a mesh axis.

The reference has NO mixture-of-experts or expert parallelism anywhere
(SURVEY.md §2.6: "expert parallelism ... NOT present") — this goes past it,
giving the LM blocks a sparse-FFN option that scales parameters with device
count. TPU-native formulation: token-choice top-k routing with a fixed
per-expert capacity (static shapes — XLA requires them), dispatch/combine as
einsums against a (tokens, experts, capacity) one-hot, expert weights held as
single (E, ...) tensors whose leading dim shards over an `ep` mesh axis.
Under GSPMD the dispatch einsum lowers to the all_to_all exchange; no
hand-written routing collectives.

Routing follows the Switch/GShard recipe: softmax gate in f32, per-expert
capacity ceil(T/E * capacity_factor), tokens over capacity are dropped (the
residual connection around the block carries them), load-balancing auxiliary
loss sown as an intermediate.
"""

from __future__ import annotations

import math
from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def _constrain(x, spec):
    """Best-effort sharding constraint: applies under an active mesh; a no-op
    when tracing without one (single-device tests)."""
    try:
        return jax.lax.with_sharding_constraint(x, spec)
    except (ValueError, RuntimeError):
        return x


class MoEMlp(nn.Module):
    """Drop-in replacement for the block MLP: y = combine(experts(dispatch(x))).

    Args:
      d_model / d_inner: token and hidden widths (as the dense Mlp).
      n_experts: E. With expert parallelism, E % mesh.shape[ep_axis] == 0.
      top_k: experts per token (1 = Switch, 2 = GShard-style).
      capacity_factor: per-expert slots = ceil(T * top_k / E * capacity_factor).
      ep_axis: mesh axis name to constrain expert tensors to (None = no
        constraint; GSPMD can still shard via param shardings).
    """

    d_model: int
    d_inner: int
    n_experts: int
    top_k: int = 1
    capacity_factor: float = 1.25
    ep_axis: str | None = None
    activation: Callable = nn.gelu
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        orig_shape = x.shape
        orig_dtype = x.dtype
        e = self.n_experts
        tokens = x.reshape(-1, orig_shape[-1])
        t = tokens.shape[0]
        cap = max(int(math.ceil(t * self.top_k / e * self.capacity_factor)), 1)

        # --- gate (f32 for a stable softmax) ---
        logits = nn.Dense(e, dtype=jnp.float32, name="gate")(
            tokens.astype(jnp.float32)
        )
        probs = jax.nn.softmax(logits, axis=-1)  # (T, E)

        # --- top-k routing with capacity ---
        # Iteratively assign choice k, carrying per-expert fill counts so a
        # token's 2nd choice lands after all 1st-choice tokens of that expert.
        fill = jnp.zeros((e,), jnp.int32)
        masked = probs
        dispatch = jnp.zeros((t, e, cap), jnp.float32)
        combine = jnp.zeros((t, e, cap), jnp.float32)
        for _ in range(self.top_k):
            idx = jnp.argmax(masked, axis=-1)  # (T,)
            gate_p = jnp.take_along_axis(probs, idx[:, None], axis=-1)[:, 0]
            onehot = jax.nn.one_hot(idx, e, dtype=jnp.int32)  # (T, E)
            pos = jnp.cumsum(onehot, axis=0) * onehot + fill[None, :] * onehot
            keep = (pos > 0) & (pos <= cap)  # (T, E) bool
            slot = jnp.clip(pos - 1, 0, cap - 1)
            oh_slot = jax.nn.one_hot(slot.reshape(-1), cap, dtype=jnp.float32)
            d_k = (
                keep.reshape(-1, 1).astype(jnp.float32) * oh_slot
            ).reshape(t, e, cap)
            dispatch = dispatch + d_k
            combine = combine + d_k * gate_p[:, None, None]
            fill = fill + jnp.sum(onehot * keep.astype(jnp.int32), axis=0)
            masked = masked * (1.0 - onehot.astype(jnp.float32))

        # --- load-balancing aux loss (Switch eq. 4): E * sum_e f_e * P_e ---
        frac = jnp.mean(
            jnp.sum(dispatch, axis=-1).astype(jnp.float32), axis=0
        )  # fraction of tokens per expert
        mean_p = jnp.mean(probs, axis=0)
        self.sow("intermediates", "aux_loss", e * jnp.sum(frac * mean_p))

        # --- dispatch -> experts -> combine ---
        dtype = self.dtype or orig_dtype
        ep = P(self.ep_axis) if self.ep_axis else None
        scale_in = 1.0 / math.sqrt(self.d_model)
        scale_hid = 1.0 / math.sqrt(self.d_inner)
        w1 = self.param(
            "w1", nn.initializers.normal(scale_in), (e, self.d_model, self.d_inner)
        )
        b1 = self.param("b1", nn.initializers.zeros, (e, self.d_inner))
        w2 = self.param(
            "w2", nn.initializers.normal(scale_hid), (e, self.d_inner, self.d_model)
        )
        b2 = self.param("b2", nn.initializers.zeros, (e, self.d_model))

        xin = jnp.einsum(
            "tec,td->ecd", dispatch.astype(dtype), tokens.astype(dtype),
            preferred_element_type=jnp.float32,
        )
        if ep is not None:
            xin = _constrain(xin, P(self.ep_axis, None, None))
        h = jnp.einsum(
            "ecd,edf->ecf", xin.astype(dtype), w1.astype(dtype),
            preferred_element_type=jnp.float32,
        ) + b1[:, None, :]
        h = self.activation(h)
        y_e = jnp.einsum(
            "ecf,efd->ecd", h.astype(dtype), w2.astype(dtype),
            preferred_element_type=jnp.float32,
        ) + b2[:, None, :]
        if ep is not None:
            y_e = _constrain(y_e, P(self.ep_axis, None, None))
        y = jnp.einsum(
            "tec,ecd->td", combine, y_e.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        return y.reshape(orig_shape).astype(orig_dtype)


def moe_param_shardings(mesh, params, ep_axis: str = "ep"):
    """NamedSharding pytree for a model containing MoEMlp layers: expert
    tensors (w1/b1/w2/b2, leading dim n_experts) shard over `ep_axis`;
    everything else replicated. MoE modules are recognized structurally —
    a param dict holding both a `gate` submodule and `w1`/`w2` expert
    stacks — so this works at any nesting depth and module name."""
    from jax.sharding import NamedSharding

    expert_paths: set[tuple] = set()

    def scan(node, path):
        if isinstance(node, dict):
            if "gate" in node and "w1" in node and "w2" in node:
                for name in ("w1", "b1", "w2", "b2"):
                    if name in node:
                        expert_paths.add(path + (name,))
            for k, v in node.items():
                scan(v, path + (k,))

    scan(params, ())

    def one(path, leaf):
        keys = tuple(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if keys in expert_paths and leaf.ndim >= 1:
            return NamedSharding(mesh, P(*([ep_axis] + [None] * (leaf.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(one, params)
