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


def sample_logits(
    rng, logits, temperature: float = 1.0, top_k: int = 0, top_p: float = 0.0
):
    """Greedy (temperature 0) or categorical sampling with optional top-k
    and nucleus top-p filtering (the reference's
    modify_logits_for_top_p_filtering, flash_attn/utils/generation.py:34)."""
    if temperature == 0.0:
        return logits.argmax(-1)
    logits = logits / temperature
    if top_k > 0:
        kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p > 0.0:
        sorted_logits = jnp.sort(logits, axis=-1)  # ascending
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # Drop tokens in the low-probability tail whose cumulative mass
        # stays below 1 - top_p (the kept set always includes the argmax).
        drop_sorted = cum <= (1.0 - top_p)
        kth_idx = drop_sorted.sum(-1)  # first kept index per row
        thresh = jnp.take_along_axis(sorted_logits, kth_idx[..., None], axis=-1)
        logits = jnp.where(logits < thresh, -jnp.inf, logits)
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


def generate_kv(
    model,
    params,
    input_ids: jax.Array,
    max_new_tokens: int,
    max_length: int,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.0,
    rng: jax.Array | None = None,
):
    """KV-cached autoregressive generation for attention LMs
    (models.gpt.GPTLMHeadModel): one O(1)-per-token decode step instead of
    re-running the full forward — the reference's InferenceParams decode
    loop (flash_attn/utils/generation.py). One lax.scan covers prefill and
    generation: known prompt tokens are fed through the same step (warming
    the cache); sampling only takes over past the prompt."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    b, l0 = input_ids.shape
    tokens = jnp.zeros((b, max_length), input_ids.dtype)
    tokens = jax.lax.dynamic_update_slice(tokens, input_ids, (0, 0))
    caches = model.init_cache(b, max_length)

    def body(carry, pos):
        tokens, caches, rng = carry
        rng, sub = jax.random.split(rng)
        tok_t = jax.lax.dynamic_slice(tokens, (0, pos), (b, 1))
        logits, caches = model.apply(
            {"params": params}, tok_t, caches, pos, method=model.step
        )
        nxt = sample_logits(sub, logits[:, 0], temperature, top_k, top_p)
        nxt = nxt.astype(tokens.dtype)
        # Past the prompt, write the sampled token into slot pos+1; inside
        # the prompt keep the given token (prefill).
        write = (pos + 1 >= l0) & (pos + 1 < max_length)
        idx = jnp.minimum(pos + 1, max_length - 1)
        cur = jax.lax.dynamic_slice(tokens, (0, idx), (b, 1))[:, 0]
        upd = jnp.where(write, nxt, cur)
        tokens = jax.vmap(lambda t, n: t.at[idx].set(n))(tokens, upd)
        return (tokens, caches, rng), None

    steps = jnp.arange(l0 - 1 + max_new_tokens)
    (tokens, _, _), _ = jax.lax.scan(body, (tokens, caches, rng), steps)
    return tokens[:, : l0 + max_new_tokens]
