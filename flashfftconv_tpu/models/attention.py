"""Multi-head self-attention mixer (the attention alternative the reference
ships alongside its conv mixers: examples/hyena-dna/hyenadna_flashfftconv.py
SelfAttention/MHA, and the vendored flash_attn/modules/mha.py).

On TPU, scaled-dot-product attention is a pair of MXU batched matmuls with a
fused softmax — XLA produces a flash-attention-grade schedule for these
shapes, so no custom kernel is needed. Registered as mixer "mha" so LM
configs can swap conv <-> attention like the reference registry does.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from flashfftconv_tpu.ops.fused import scaled_masked_softmax


class MHAOperator(nn.Module):
    d_model: int
    l_max: int = 0  # unused; signature parity with the conv mixers
    num_heads: int = 8
    causal: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, u, deterministic: bool = True):
        # u: (B, L, D)
        b, l, d = u.shape
        assert d % self.num_heads == 0
        hd = d // self.num_heads
        qkv = nn.Dense(3 * d, dtype=u.dtype, name="qkv_proj")(u)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, l, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, l, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, l, self.num_heads, hd).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        mask = None
        if self.causal:
            mask = jnp.tril(jnp.ones((l, l), bool))[None, None]
        attn = scaled_masked_softmax(scores, mask=mask, scale=hd**-0.5)
        attn = nn.Dropout(rate=self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, d)
        return nn.Dense(d, dtype=u.dtype, name="out_proj")(out)
