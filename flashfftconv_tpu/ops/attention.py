"""Flash attention for the MHA mixer — the TPU-native equivalent of the
reference's vendored flash-attention CUDA kernels
(/root/reference/examples/hyena/flash-attention/csrc/flash_attn/ via
flash_attn/flash_attn_interface.py:flash_attn_unpadded_*).

On TPU the fused, O(L)-memory softmax attention is the Pallas TPU
flash-attention kernel shipped with JAX (blocked online-softmax with a
custom VJP, the same algorithm as the reference's fmha kernels). Off-TPU
(CPU tests) and for shapes the kernel cannot tile (tiny L, odd head_dim) we
fall back to the XLA O(L^2) reference, which is numerically identical.

Layout is (B, num_heads, L, head_dim) like the kernel expects; the module
layer (models/attention.py) handles (B, L, D) <-> heads reshapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Minimum tile the TPU kernel can block over; below this the XLA path is
# used (it is faster there anyway — one fused matmul pair).
_MIN_FLASH_LEN = 256


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def mha_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = True,
    sm_scale: float | None = None,
) -> jax.Array:
    """O(L^2) XLA softmax attention, f32 accumulation. Shapes (B, H, L, D)."""
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * sm_scale
    if causal:
        l_q, l_k = scores.shape[-2], scores.shape[-1]
        mask = jnp.tril(jnp.ones((l_q, l_k), bool), k=l_k - l_q)
        scores = jnp.where(mask[None, None], scores, -jnp.inf)
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


def _flash_ok(q: jax.Array) -> bool:
    b, h, l, d = q.shape
    # The Pallas kernel blocks L in >=128 chunks and keeps head_dim whole in
    # lanes; 128-multiple head_dim and >=256 L tile cleanly on the MXU.
    return l >= _MIN_FLASH_LEN and l % 128 == 0 and d % 128 == 0


@functools.partial(jax.jit, static_argnames=("causal", "sm_scale", "impl"))
def flash_mha(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = True,
    sm_scale: float | None = None,
    impl: str = "auto",
) -> jax.Array:
    """Fused multi-head attention, shapes (B, num_heads, L, head_dim).

    impl: 'auto' (flash kernel on TPU when shapes tile, else XLA),
    'flash' (force the Pallas kernel), 'xla' (force the reference path).
    Differentiable in q/k/v on both paths.
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    use_flash = impl == "flash" or (
        impl == "auto" and _on_tpu() and _flash_ok(q)
    )
    if not use_flash:
        return mha_reference(q, k, v, causal=causal, sm_scale=sm_scale)

    from jax.experimental.pallas.ops.tpu import flash_attention as _fa

    out = _fa.flash_attention(
        q, k, v, causal=causal, sm_scale=float(sm_scale)
    )
    return out.astype(v.dtype)
