"""GPT / OPT transformer LMs (flax) — the attention-based model family the
reference vendors alongside its conv models
(/root/reference/examples/hyena/flash-attention/flash_attn/models/gpt.py and
models/opt.py: GPTLMHeadModel with learned positional embeddings, pre-norm
blocks, tied lm head; the OPT variant adds a word-embedding projection for
widths where embed_dim != d_model and a final layer norm).

These reuse the same pre-norm Block as the conv LMs (models.lm) with the
"mha" mixer, so conv <-> attention swaps stay config-level, and the TP/DP
shardings from parallel.mesh apply unchanged (Dense kernels shard on the
same axes).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from flashfftconv_tpu.models.lm import Block


class GPTLMHeadModel(nn.Module):
    """GPT-2-style LM: word + learned position embeddings -> n_layer pre-norm
    MHA blocks -> final LN -> tied lm head (flash_attn/models/gpt.py)."""

    d_model: int
    n_layer: int
    d_inner: int
    vocab_size: int
    l_max: int
    num_heads: int = 8
    embed_dropout: float = 0.1
    resid_dropout: float = 0.0
    pad_vocab_size_multiple: int = 8
    # OPT variants with word_embed_proj_dim != d_model project the embedding
    # in and out (flash_attn/models/opt.py remaps project_in/project_out).
    embed_dim: int | None = None
    mlp_activation: str = "gelu"  # OPT uses relu (opt_config_to_gpt2_config)
    dtype: Any = jnp.bfloat16

    mixer_kwargs: dict | None = None  # extra MHAOperator options (rotary,
    # alibi, window, ...) merged over the defaults
    remat: bool = False  # per-block gradient checkpointing (jax.checkpoint)

    def setup(self):
        vocab = self.vocab_size
        if vocab % self.pad_vocab_size_multiple:
            vocab += self.pad_vocab_size_multiple - vocab % self.pad_vocab_size_multiple
        embed_dim = self.embed_dim or self.d_model
        self._embed_dim = embed_dim
        self.embed = nn.Embed(vocab, embed_dim, dtype=self.dtype, name="embeddings")
        # Positional embeddings live in d_model space: OPT projects the word
        # embedding in FIRST, then adds positions (modeling_opt.py
        # OPTDecoder.forward); for GPT-2 embed_dim == d_model so the order
        # is indistinguishable.
        self.pos = self.param(
            "pos_embeddings",
            nn.initializers.normal(0.02),
            (self.l_max, self.d_model),
        )
        if embed_dim != self.d_model:
            self.project_in = nn.Dense(
                self.d_model, use_bias=False, dtype=self.dtype, name="project_in"
            )
            self.project_out = nn.Dense(
                embed_dim, use_bias=False, dtype=self.dtype, name="project_out"
            )
        mk = dict({"num_heads": self.num_heads, "causal": True},
                  **(self.mixer_kwargs or {}))
        block_cls = nn.remat(Block, static_argnums=(2,)) if self.remat else Block
        self.blocks = [
            block_cls(
                d_model=self.d_model,
                d_inner=self.d_inner,
                mixer="mha",
                mixer_kwargs=mk,
                resid_dropout=self.resid_dropout,
                mlp_activation=self.mlp_activation,
                name=f"block_{i}",
            )
            for i in range(self.n_layer)
        ]
        self.ln_f = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_f")
        self.embed_drop = nn.Dropout(rate=self.embed_dropout)

    def _head(self, x):
        h = self.ln_f(x.astype(jnp.float32))
        if self._embed_dim != self.d_model:
            h = self.project_out(h.astype(self.dtype))
        return self.embed.attend(h.astype(self.embed.dtype)).astype(jnp.float32)

    def __call__(self, input_ids, deterministic: bool = True):
        l = input_ids.shape[1]
        x = self.embed(input_ids)
        if self._embed_dim != self.d_model:
            x = self.project_in(x)
        x = x + self.pos[:l].astype(self.dtype)
        x = self.embed_drop(x, deterministic=deterministic)
        for blk in self.blocks:
            x = blk(x, deterministic)
        return self._head(x)

    # ---- KV-cached incremental decoding (the reference's InferenceParams
    # path, flash_attn/utils/generation.py) -------------------------------

    def init_cache(self, batch: int, max_length: int, dtype=None):
        hd = self.d_model // self.num_heads
        shape = (batch, self.num_heads, max_length, hd)
        dtype = dtype or self.dtype
        return [
            {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
            for _ in range(self.n_layer)
        ]

    def step(self, token_t, caches, pos):
        """One decode step. token_t: (B, 1) int ids; pos: scalar position.
        Returns (logits (B, 1, V), new_caches)."""
        x = self.embed(token_t)
        if self._embed_dim != self.d_model:
            x = self.project_in(x)
        pos_row = jax.lax.dynamic_slice_in_dim(self.pos, pos, 1, axis=0)
        x = x + pos_row[None].astype(self.dtype)
        new_caches = []
        for blk, cache in zip(self.blocks, caches):
            x, cache = blk.step(x, cache, pos)
            new_caches.append(cache)
        return self._head(x), new_caches


def opt_lm(vocab_size: int, l_max: int, width: str = "125m", **kwargs) -> GPTLMHeadModel:
    """OPT configuration shortcuts (flash_attn/models/opt.py config remap)."""
    cfgs = {
        "125m": dict(d_model=768, n_layer=12, num_heads=12, embed_dim=None),
        "350m": dict(d_model=1024, n_layer=24, num_heads=16, embed_dim=512),
        "1.3b": dict(d_model=2048, n_layer=24, num_heads=32, embed_dim=None),
    }
    cfg = cfgs[width]
    return GPTLMHeadModel(
        d_model=cfg["d_model"],
        n_layer=cfg["n_layer"],
        d_inner=4 * cfg["d_model"],
        vocab_size=vocab_size,
        l_max=l_max,
        num_heads=cfg["num_heads"],
        embed_dim=cfg["embed_dim"],
        mlp_activation=kwargs.pop("mlp_activation", "relu"),
        **kwargs,
    )
