"""Autoregressive generation for the conv LMs.

Equivalent of the reference's generation utilities
(examples/hyena/flash-attention/flash_attn/utils/generation.py — greedy /
temperature / top-k sampling). Long-conv models have no KV cache; each step
re-runs the forward over the (fixed-size, causal) context window, which XLA
compiles once thanks to the static padded shape.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def sample_logits(rng, logits, temperature: float = 1.0, top_k: int = 0):
    if temperature == 0.0:
        return logits.argmax(-1)
    logits = logits / temperature
    if top_k > 0:
        kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    return jax.random.categorical(rng, logits, axis=-1)


def generate(
    apply_fn: Callable,
    params,
    input_ids: jax.Array,
    max_new_tokens: int,
    max_length: int,
    temperature: float = 1.0,
    top_k: int = 0,
    rng: jax.Array | None = None,
):
    """Generate tokens autoregressively. input_ids (B, L0); returns
    (B, L0 + max_new_tokens). The context is right-padded to max_length so
    one compiled forward serves every step."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    b, l0 = input_ids.shape
    tokens = jnp.zeros((b, max_length), input_ids.dtype)
    tokens = jax.lax.dynamic_update_slice(tokens, input_ids, (0, 0))

    def body(carry, _):
        tokens, pos, rng = carry
        rng, sub = jax.random.split(rng)
        logits = apply_fn({"params": params}, tokens, deterministic=True)
        idx = jnp.clip(pos - 1, 0, max_length - 1)
        last = jax.vmap(lambda lg: lg[idx])(logits)
        nxt = sample_logits(sub, last, temperature, top_k).astype(tokens.dtype)
        tokens = jax.vmap(lambda t, n: t.at[pos].set(n))(tokens, nxt)
        return (tokens, pos + 1, rng), None

    (tokens, _, _), _ = jax.lax.scan(
        body, (tokens, jnp.asarray(l0), rng), None, length=max_new_tokens
    )
    return tokens[:, : l0 + max_new_tokens]
