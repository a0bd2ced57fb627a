"""Vision Transformer (flax) — the ViT family from the reference's vendored
flash-attention (/root/reference/examples/hyena/flash-attention/flash_attn/
models/vit.py: patch embedding, cls token or global pooling, pre-norm MHA
blocks with fused-MLP-style feedforward, classification head).

Reuses MHAOperator (non-causal) and the Mlp from models.lm so the attention
and feedforward paths are the same XLA-fused compositions used everywhere
else in this framework.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from flashfftconv_tpu.models.attention import MHAOperator
from flashfftconv_tpu.models.lm import Mlp


def _gelu_exact(x):
    return nn.gelu(x, approximate=False)


class ViTBlock(nn.Module):
    d_model: int
    d_inner: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        res = x.astype(jnp.float32)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(res).astype(x.dtype)
        h = MHAOperator(
            d_model=self.d_model, num_heads=self.num_heads, causal=False,
            dropout=self.dropout, name="mixer",
        )(h, deterministic=deterministic)
        res = res + h.astype(jnp.float32)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(res).astype(x.dtype)
        # timm (the vendored reference's base) and HF ViT use exact-erf GELU,
        # unlike GPT-2's tanh approximation.
        h = Mlp(self.d_inner, self.d_model, activation=_gelu_exact, name="mlp")(h)
        return (res + h.astype(jnp.float32)).astype(x.dtype)


class VisionTransformer(nn.Module):
    """ViT classifier. Input (B, H, W, C) images; global_pool="token" uses a
    cls token (the vendored default), "avg" mean-pools patch tokens."""

    num_classes: int
    patch_size: int = 16
    d_model: int = 384
    n_layer: int = 12
    num_heads: int = 6
    mlp_ratio: int = 4
    dropout: float = 0.0
    global_pool: str = "token"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, images, deterministic: bool = True):
        b, h, w, c = images.shape
        p = self.patch_size
        assert h % p == 0 and w % p == 0, "image size must divide patch size"
        x = nn.Conv(
            self.d_model, (p, p), strides=(p, p), dtype=self.dtype,
            name="patch_embed",
        )(images.astype(self.dtype))
        x = x.reshape(b, -1, self.d_model)
        n_tok = x.shape[1]

        if self.global_pool == "token":
            cls = self.param(
                "cls_token", nn.initializers.normal(0.02), (1, 1, self.d_model)
            )
            x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.d_model)).astype(x.dtype), x], 1)
            n_tok += 1
        pos = self.param(
            "pos_embeddings", nn.initializers.normal(0.02), (n_tok, self.d_model)
        )
        x = x + pos.astype(x.dtype)
        x = nn.Dropout(rate=self.dropout)(x, deterministic=deterministic)

        for i in range(self.n_layer):
            x = ViTBlock(
                d_model=self.d_model,
                d_inner=self.mlp_ratio * self.d_model,
                num_heads=self.num_heads,
                dropout=self.dropout,
                name=f"block_{i}",
            )(x, deterministic=deterministic)

        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_f")(x.astype(jnp.float32))
        feat = x[:, 0] if self.global_pool == "token" else x.mean(axis=1)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(feat)
