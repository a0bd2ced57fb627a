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

Beyond plain causal/bidirectional attention this module covers the
reference's other attention variants:

- additive attention bias (ALiBi): the reference's Triton kernel takes a
  `bias` argument (flash_attn/flash_attn_triton.py:483-494) and M2-BERT
  feeds ALiBi slopes through its encoder (examples/bert/bert_layers.py:
  286-310). Here `flash_mha(..., bias=...)` forwards the bias into the
  Pallas kernel's `ab` operand (pre-divided by sm_scale because the TPU
  kernel adds ab before scaling) and `alibi_slopes`/`alibi_bias` build the
  standard slope table.
- sliding-window local attention: `flash_mha(..., window=W)` restricts
  each query to the last W keys, computed O(L*W) via the splash-attention
  kernel's LocalMask on TPU.
- blocksparse attention: `blocksparse_mha` is the analog of the
  reference's flash_blocksparse_attn_interface.py (a 0/1 mask over
  (row, col) key/query blocks; the CUDA side uses 256-wide blocks, here
  the block size is a parameter). On TPU the splash kernel skips masked
  blocks entirely, so compute scales with mask density.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Minimum tile the TPU kernel can block over; below this the XLA path is
# used (it is faster there anyway — one fused matmul pair).
_MIN_FLASH_LEN = 256


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def alibi_slopes(num_heads: int) -> jax.Array:
    """Per-head ALiBi slopes (Press et al.), the table the reference builds
    in examples/bert/bert_layers.py (get_alibi_head_slopes): for power-of-2
    head counts, a geometric series 2^(-8/n), 2^(-16/n), ...; otherwise the
    nearest-power-of-2 series interleaved with its sqrt-ratio refinement."""

    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(np.log2(n) - 3)))
        return [start * (start**i) for i in range(n)]

    if np.log2(num_heads).is_integer():
        slopes = pow2_slopes(num_heads)
    else:
        base = 2 ** int(np.floor(np.log2(num_heads)))
        slopes = pow2_slopes(base)
        extra = pow2_slopes(2 * base)[0::2][: num_heads - base]
        slopes = slopes + extra
    return jnp.asarray(slopes, jnp.float32)


def alibi_bias(
    num_heads: int, l_q: int, l_k: int, dtype=jnp.float32
) -> jax.Array:
    """(1, H, Lq, Lk) additive attention bias: -slope_h * |i - j| with query
    position i aligned to the end of the key axis (so decode steps with
    l_q < l_k score history correctly)."""
    slopes = alibi_slopes(num_heads)
    qpos = jnp.arange(l_q) + (l_k - l_q)
    kpos = jnp.arange(l_k)
    dist = jnp.abs(qpos[:, None] - kpos[None, :]).astype(jnp.float32)
    return (-slopes[:, None, None] * dist)[None].astype(dtype)


def _window_mask(l_q: int, l_k: int, window: int) -> jax.Array:
    """Boolean (Lq, Lk) sliding-window causal mask: query i (aligned to the
    end of the key axis) sees keys (i - window, i]."""
    qpos = jnp.arange(l_q)[:, None] + (l_k - l_q)
    kpos = jnp.arange(l_k)[None, :]
    return (kpos <= qpos) & (kpos > qpos - window)


def mha_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = True,
    sm_scale: float | None = None,
    bias: jax.Array | None = None,
    window: int | None = None,
    segment_ids: jax.Array | None = None,
) -> jax.Array:
    """O(L^2) XLA softmax attention, f32 accumulation. Shapes (B, H, L, D).

    bias: additive attention bias broadcastable to (B, H, Lq, Lk), applied
    after the sm_scale multiply (the flash_attn_triton.py convention).
    window: sliding-window width (implies causal banding).
    segment_ids: (B, L) int; tokens attend only within equal ids (the
    packed-sequence form of the reference's unpadded attention).
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * sm_scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    l_q, l_k = scores.shape[-2], scores.shape[-1]
    if window is not None:
        scores = jnp.where(_window_mask(l_q, l_k, window)[None, None], scores, -jnp.inf)
    elif causal:
        mask = jnp.tril(jnp.ones((l_q, l_k), bool), k=l_k - l_q)
        scores = jnp.where(mask[None, None], scores, -jnp.inf)
    if segment_ids is not None:
        same = segment_ids[:, None, :, None] == segment_ids[:, None, None, :]
        scores = jnp.where(same, scores, -jnp.inf)
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


def _flash_ok(q: jax.Array) -> bool:
    b, h, l, d = q.shape
    # The Pallas kernel blocks L in >=128 chunks and keeps head_dim whole in
    # lanes; 128-multiple head_dim and >=256 L tile cleanly on the MXU.
    return l >= _MIN_FLASH_LEN and l % 128 == 0 and d % 128 == 0


@functools.partial(
    jax.jit, static_argnames=("causal", "sm_scale", "impl", "window")
)
def flash_mha(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = True,
    sm_scale: float | None = None,
    impl: str = "auto",
    bias: jax.Array | None = None,
    window: int | None = None,
    segment_ids: jax.Array | None = None,
) -> jax.Array:
    """Fused multi-head attention, shapes (B, num_heads, L, head_dim).

    impl: 'auto' (flash kernel on TPU when shapes tile, else XLA),
    'flash' (force the Pallas kernel), 'xla' (force the reference path).
    bias: additive attention bias broadcastable to (B, H, L, L) — e.g.
    `alibi_bias(...)` — applied after the sm_scale multiply.
    window: static sliding-window width; on TPU this routes to the splash
    attention kernel, whose block skipping makes cost O(L * window).
    segment_ids: (B, L) int; tokens attend only within equal ids — the
    packed-sequence (unpadded) attention of the reference's
    bert_padding.py + flash_attn_unpadded path, done the static-shape TPU
    way (pack_sequences builds these).
    Differentiable in q/k/v (and bias) on all paths.
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    use_flash = impl == "flash" or (
        impl == "auto" and _on_tpu() and _flash_ok(q)
    )
    if not use_flash:
        return mha_reference(
            q, k, v, causal=causal, sm_scale=sm_scale, bias=bias,
            window=window, segment_ids=segment_ids,
        )

    if window is not None:
        if bias is not None or segment_ids is not None:
            raise NotImplementedError(
                "window + bias/segment_ids on the flash path (splash "
                "attention has no additive-bias operand); use impl='xla'"
            )
        return _splash_local(q, k, v, window=window, sm_scale=float(sm_scale))

    from jax.experimental.pallas.ops.tpu import flash_attention as _fa

    ab = None
    if bias is not None:
        # The Pallas kernel computes softmax((q@k' + ab) * sm_scale), i.e.
        # ab is added BEFORE the scale multiply; our convention (matching
        # the reference Triton kernel) adds bias after. Pre-divide.
        b, h, l, _ = q.shape
        ab = jnp.broadcast_to(
            bias.astype(jnp.float32) / float(sm_scale), (b, h, l, l)
        )
    seg = None
    if segment_ids is not None:
        seg = _fa.SegmentIds(q=segment_ids, kv=segment_ids)
    out = _fa.flash_attention(
        q, k, v, ab=ab, segment_ids=seg, causal=causal, sm_scale=float(sm_scale)
    )
    return out.astype(v.dtype)


def pack_sequences(seqs, pack_len: int, pad_id: int = 0):
    """Pack variable-length sequences into fixed (rows, pack_len) buffers
    with per-token segment ids — the static-shape TPU analog of the
    reference's unpad_input/pad_input (flash_attn/bert_padding.py), which
    concatenates valid tokens and tracks cu_seqlens.

    seqs: list of (l_i, ...) numpy/jax arrays (features optional). Greedy
    first-fit packing. Returns (packed, segment_ids, index) where packed is
    (rows, pack_len, ...) zero-padded, segment_ids is (rows, pack_len) int32
    with 1-based ids per original sequence (pad slots get `pad_id`), and
    index maps each original sequence -> (row, start). Feed segment_ids to
    flash_mha; recover outputs per sequence via index.
    """
    rows: list[list] = []  # each: list of (seq_idx, seq)
    space: list[int] = []
    for i, s in enumerate(seqs):
        li = s.shape[0]
        if li > pack_len:
            raise ValueError(f"sequence {i} length {li} > pack_len {pack_len}")
        for r in range(len(rows)):
            if space[r] >= li:
                rows[r].append((i, s))
                space[r] -= li
                break
        else:
            rows.append([(i, s)])
            space.append(pack_len - li)

    feat_shape = np.asarray(seqs[0]).shape[1:]
    packed = np.zeros((len(rows), pack_len, *feat_shape), np.asarray(seqs[0]).dtype)
    seg = np.full((len(rows), pack_len), pad_id, np.int32)
    index: dict[int, tuple[int, int]] = {}
    for r, row in enumerate(rows):
        off = 0
        for i, s in row:
            li = s.shape[0]
            packed[r, off : off + li] = np.asarray(s)
            seg[r, off : off + li] = i + 1
            index[i] = (r, off)
            off += li
    return packed, seg, index


def _splash_block_sizes(l: int):
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as _sk,
    )

    blk = min(512, l)
    return _sk.BlockSizes(
        block_q=blk,
        block_kv=blk,
        block_kv_compute=blk,
        block_q_dkv=blk,
        block_kv_dkv=blk,
        block_kv_dkv_compute=blk,
        use_fused_bwd_kernel=True,
    )


def _splash_call(q, k, v, mask, sm_scale: float) -> jax.Array:
    """Run the splash-attention kernel with a static per-head mask.
    q/k/v: (B, H, L, D). The kernel convention pre-scales q and takes
    (H, L, D) operands, so vmap over batch."""
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as _sk,
    )

    kernel = _sk.make_splash_mha(
        mask,
        block_sizes=_splash_block_sizes(q.shape[2]),
        head_shards=1,
        q_seq_shards=1,
    )
    out = jax.vmap(kernel)(q * sm_scale, k, v)
    return out.astype(v.dtype)


def _splash_local(q, k, v, window: int, sm_scale: float) -> jax.Array:
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_mask as _sm,
    )

    _, h, l, _ = q.shape
    # LocalMask((l,l), (left, right), offset): keys in [i-left, i+right].
    head = _sm.LocalMask((l, l), (window - 1, 0), 0)
    return _splash_call(q, k, v, _sm.MultiHeadMask([head] * h), sm_scale)


def blocksparse_mha(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    blockmask: np.ndarray,
    block_size: int = 256,
    causal: bool = False,
    sm_scale: float | None = None,
    impl: str = "auto",
) -> jax.Array:
    """Blocksparse attention — the analog of the reference's
    flash_blocksparse_attn_interface.py (0/1 mask over (row, col) blocks of
    the score matrix; its CUDA kernels hardcode 256-wide blocks).

    blockmask: static (L//block_size, L//block_size) 0/1 numpy array; block
    (r, c) == 0 means queries in row-block r never attend to keys in
    column-block c. causal additionally lower-triangularizes within the
    kept blocks. On TPU the splash kernel skips zero blocks entirely; the
    XLA fallback materializes the dense mask.
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    b, h, l, _ = q.shape
    blockmask = np.asarray(blockmask, bool)
    nr, nc = blockmask.shape
    if nr * block_size != l or nc * block_size != l:
        raise ValueError(
            f"blockmask {blockmask.shape} x block_size {block_size} "
            f"does not tile L={l}"
        )
    dense = np.kron(blockmask, np.ones((block_size, block_size), bool))
    if causal:
        dense &= np.tril(np.ones((l, l), bool))

    use_flash = impl == "flash" or (
        impl == "auto" and _on_tpu() and _flash_ok(q)
    )
    if use_flash:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_mask as _sm,
        )

        head = _sm.NumpyMask(dense)
        return _splash_call(q, k, v, _sm.MultiHeadMask([head] * h), float(sm_scale))

    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * sm_scale
    scores = jnp.where(jnp.asarray(dense)[None, None], scores, -jnp.inf)
    attn = jax.nn.softmax(scores, axis=-1)
    # Fully-masked rows produce NaN out of softmax; the reference kernel
    # emits zeros there. Match it.
    attn = jnp.where(jnp.asarray(dense.any(1))[None, None, :, None], attn, 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v)
