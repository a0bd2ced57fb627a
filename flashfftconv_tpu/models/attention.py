"""Multi-head self-attention mixer (the attention alternative the reference
ships alongside its conv mixers: examples/hyena-dna/hyenadna_flashfftconv.py
SelfAttention/MHA, and the vendored flash_attn/modules/mha.py backed by the
flash-attention CUDA kernels in csrc/flash_attn/).

The compute path is ops.attention.flash_mha: the Pallas TPU flash-attention
kernel (blocked online-softmax, O(L) memory, custom VJP) on TPU, and the XLA
O(L^2) reference elsewhere. Registered as mixer "mha" so LM configs can swap
conv <-> attention like the reference registry does.

Incremental decoding: init_cache() + apply_step() run one-token KV-cached
steps — the analog of the reference's flash_attn/utils/generation.py
InferenceParams path.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from flashfftconv_tpu.ops.attention import alibi_bias, alibi_slopes, flash_mha
from flashfftconv_tpu.ops.fused import apply_rotary_emb


def rotary_tables(l: int, dim: int, base: float = 10000.0):
    """cos/sin tables (L, dim/2) for GPT-NeoX-style rotary embedding — the
    analog of the reference's RotaryEmbedding cache
    (flash_attn/layers/rotary.py:60-78, inv_freq = base^(-2i/dim))."""
    inv_freq = 1.0 / (base ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = jnp.arange(l, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)
    return jnp.cos(freqs), jnp.sin(freqs)


class MHAOperator(nn.Module):
    d_model: int
    l_max: int = 0  # unused; signature parity with the conv mixers
    num_heads: int = 8
    causal: bool = True
    dropout: float = 0.0
    impl: str = "auto"  # 'auto' | 'flash' | 'xla'
    alibi: bool = False  # ALiBi positional bias (ref bert_layers.py ALiBi)
    window: int | None = None  # sliding-window width (ref local attention)
    rotary_dim: int = 0  # rotary channels per head, 0 = off (ref MHA
    # rotary_emb_dim, flash_attn/modules/mha.py); use head_dim for full
    rotary_base: float = 10000.0

    def setup(self):
        self.qkv_proj = nn.Dense(3 * self.d_model, name="qkv_proj")
        self.out_proj = nn.Dense(self.d_model, name="out_proj")
        self.drop = nn.Dropout(rate=self.dropout)

    def _split_heads(self, x):
        b, l, d = x.shape
        return x.reshape(b, l, self.num_heads, d // self.num_heads).transpose(0, 2, 1, 3)

    def _rotate(self, q, k, cos, sin):
        """Apply rotary to the first rotary_dim channels of q/k (B,H,L,hd);
        cos/sin rows must match the L axis (a single row for decode steps)."""
        r = self.rotary_dim
        q_rot = apply_rotary_emb(q[..., :r], cos, sin)
        k_rot = apply_rotary_emb(k[..., :r], cos, sin)
        q = jnp.concatenate([q_rot, q[..., r:]], axis=-1) if r < q.shape[-1] else q_rot
        k = jnp.concatenate([k_rot, k[..., r:]], axis=-1) if r < k.shape[-1] else k_rot
        return q, k

    def __call__(self, u, deterministic: bool = True, segment_ids=None):
        # u: (B, L, D); segment_ids: optional (B, L) int for packed
        # variable-length sequences (the reference's unpadded-attention
        # path, see ops.attention.pack_sequences).
        b, l, d = u.shape
        assert d % self.num_heads == 0
        hd = d // self.num_heads
        qkv = self.qkv_proj(u)
        q, k, v = map(self._split_heads, jnp.split(qkv, 3, axis=-1))
        if self.rotary_dim:
            cos, sin = rotary_tables(l, self.rotary_dim, self.rotary_base)
            q, k = self._rotate(q, k, cos, sin)
        bias = alibi_bias(self.num_heads, l, l) if self.alibi else None

        if self.dropout > 0.0 and not deterministic:
            # Attention-probability dropout needs the materialized matrix;
            # only the XLA path supports it (training configs that want
            # flash attention use residual dropout instead, matching the
            # reference flash_attn kernels which also skip attn-dropout on
            # the fast path).
            scores = jnp.einsum(
                "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
            ) * (hd**-0.5)
            if bias is not None:
                scores = scores + bias
            if self.window is not None:
                qpos = jnp.arange(l)[:, None]
                kpos = jnp.arange(l)[None, :]
                keep = (kpos <= qpos) & (kpos > qpos - self.window)
                scores = jnp.where(keep[None, None], scores, -jnp.inf)
            elif self.causal:
                mask = jnp.tril(jnp.ones((l, l), bool))[None, None]
                scores = jnp.where(mask, scores, -jnp.inf)
            if segment_ids is not None:
                same = segment_ids[:, None, :, None] == segment_ids[:, None, None, :]
                scores = jnp.where(same, scores, -jnp.inf)
            attn = jax.nn.softmax(scores, axis=-1)
            attn = self.drop(attn, deterministic=False)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v)
        else:
            out = flash_mha(
                q,
                k,
                v,
                causal=self.causal,
                impl=self.impl,
                bias=bias,
                window=self.window,
                segment_ids=segment_ids,
            )

        out = out.transpose(0, 2, 1, 3).reshape(b, l, d)
        return self.out_proj(out)

    # ---- incremental decoding -------------------------------------------

    def step(self, u_t, cache, pos):
        """One KV-cached decode step. u_t: (B, 1, D); pos: scalar index of
        this token. Returns (y_t, new_cache) using cached keys/values 0..pos."""
        b, _, d = u_t.shape
        hd = d // self.num_heads
        qkv = self.qkv_proj(u_t)
        q, k, v = map(self._split_heads, jnp.split(qkv, 3, axis=-1))
        if self.rotary_dim:
            cos, sin = rotary_tables(cache["k"].shape[2], self.rotary_dim, self.rotary_base)
            row = lambda t: jax.lax.dynamic_slice_in_dim(t, pos, 1, axis=0)
            q, k = self._rotate(q, k, row(cos), row(sin))
        ck = jax.lax.dynamic_update_slice(
            cache["k"], k.astype(cache["k"].dtype), (0, 0, pos, 0)
        )
        cv = jax.lax.dynamic_update_slice(
            cache["v"], v.astype(cache["v"].dtype), (0, 0, pos, 0)
        )
        # Mask out cache slots beyond pos (future/unwritten).
        kpos = jnp.arange(ck.shape[2])
        valid = kpos <= pos
        if self.window is not None:
            valid &= kpos > pos - self.window
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, ck.astype(q.dtype), preferred_element_type=jnp.float32
        ) * (hd**-0.5)
        if self.alibi:
            slopes = alibi_slopes(self.num_heads)
            dist = jnp.abs(pos - kpos).astype(jnp.float32)
            scores = scores + (-slopes[:, None, None] * dist[None, :])[None]
        scores = jnp.where(valid[None, None, None, :], scores, -jnp.inf)
        attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, cv.astype(v.dtype))
        out = out.transpose(0, 2, 1, 3).reshape(b, 1, d)
        return self.out_proj(out), {"k": ck, "v": cv}

    def init_cache(self, batch: int, max_length: int, dtype=jnp.float32):
        """KV cache for one layer: (B, H, max_length, head_dim) keys/values."""
        hd = self.d_model // self.num_heads
        shape = (batch, self.num_heads, max_length, hd)
        return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}

    def apply_step(self, variables, u_t, cache, pos):
        """Convenience: run one decode step on an unbound module."""
        return self.apply(variables, u_t, cache, pos, method=MHAOperator.step)
