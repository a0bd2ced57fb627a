"""Flash-attention wrapper + MHA mixer tests (reference analog:
examples/hyena/flash-attention/tests/test_flash_attn.py — kernel vs PyTorch
reference parity; here the Pallas TPU kernel is exercised on real hardware
via benchmarks/tpu_attention.py, and on CPU the dispatch + decode paths)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashfftconv_tpu.models.attention import MHAOperator
from flashfftconv_tpu.ops.attention import (
    alibi_bias,
    alibi_slopes,
    blocksparse_mha,
    flash_mha,
    mha_reference,
    pack_sequences,
)


def _qkv(rng, b=2, h=4, l=256, d=64, dtype=jnp.float32):
    def one():
        return jnp.asarray(rng.standard_normal((b, h, l, d)).astype(np.float32)).astype(dtype)

    return one(), one(), one()


def test_flash_mha_fallback_matches_reference(rng):
    q, k, v = _qkv(rng)
    out = flash_mha(q, k, v, causal=True, impl="auto")
    ref = mha_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_flash_mha_noncausal(rng):
    q, k, v = _qkv(rng, l=128)
    out = flash_mha(q, k, v, causal=False)
    ref = mha_reference(q, k, v, causal=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_flash_mha_grads_finite(rng):
    q, k, v = _qkv(rng, l=128)

    def loss(q, k, v):
        return jnp.sum(flash_mha(q, k, v, causal=True) ** 2)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in (gq, gk, gv):
        assert np.isfinite(np.asarray(g)).all()


def test_alibi_slopes_power_of_two():
    """8 heads -> the canonical geometric series 2^-1 .. 2^-8 (Press et al.,
    the table the reference's bert_layers.py builds)."""
    s = np.asarray(alibi_slopes(8))
    np.testing.assert_allclose(s, [2.0 ** -(i + 1) for i in range(8)], rtol=1e-6)
    # Non-power-of-2: first `base` entries are the base series, the extras
    # are the odd-indexed entries of the doubled series.
    s12 = np.asarray(alibi_slopes(12))
    assert s12.shape == (12,)
    np.testing.assert_allclose(s12[:8], np.asarray(alibi_slopes(8)), rtol=1e-6)
    np.testing.assert_allclose(s12[8:], np.asarray(alibi_slopes(16))[0::2][:4], rtol=1e-6)


def test_flash_mha_bias_matches_manual(rng):
    """ALiBi bias through flash_mha == manual scores+bias softmax."""
    b, h, l, d = 2, 4, 64, 32
    q, k, v = _qkv(rng, b=b, h=h, l=l, d=d)
    bias = alibi_bias(h, l, l)
    out = flash_mha(q, k, v, causal=True, bias=bias)

    scale = d**-0.5
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale + bias
    mask = jnp.tril(jnp.ones((l, l), bool))[None, None]
    scores = jnp.where(mask, scores, -jnp.inf)
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(scores, -1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_flash_mha_window_matches_dense_mask(rng):
    """window=W == dense banded causal mask."""
    b, h, l, d = 1, 2, 64, 16
    q, k, v = _qkv(rng, b=b, h=h, l=l, d=d)
    w = 8
    out = flash_mha(q, k, v, causal=True, window=w)

    scale = d**-0.5
    qpos = jnp.arange(l)[:, None]
    kpos = jnp.arange(l)[None, :]
    keep = (kpos <= qpos) & (kpos > qpos - w)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    scores = jnp.where(keep[None, None], scores, -jnp.inf)
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(scores, -1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_blocksparse_mha_matches_dense(rng):
    """blocksparse_mha (XLA fallback) == dense attention restricted to the
    kept blocks (the reference flash_blocksparse_attn semantics)."""
    b, h, l, d, bs = 1, 2, 64, 16, 16
    q, k, v = _qkv(rng, b=b, h=h, l=l, d=d)
    nb = l // bs
    mrng = np.random.default_rng(0)
    blockmask = mrng.integers(0, 2, size=(nb, nb))
    blockmask[np.arange(nb), np.arange(nb)] = 1  # keep diagonal blocks
    out = blocksparse_mha(q, k, v, blockmask, block_size=bs, causal=True)

    dense = np.kron(blockmask.astype(bool), np.ones((bs, bs), bool))
    dense &= np.tril(np.ones((l, l), bool))
    scale = d**-0.5
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    scores = jnp.where(jnp.asarray(dense)[None, None], scores, -jnp.inf)
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(scores, -1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_blocksparse_mha_fully_masked_rows_zero(rng):
    """Rows whose every block is masked emit zeros, not NaN."""
    b, h, l, d, bs = 1, 1, 32, 8, 16
    q, k, v = _qkv(rng, b=b, h=h, l=l, d=d)
    blockmask = np.array([[0, 0], [1, 1]])
    out = np.asarray(blocksparse_mha(q, k, v, blockmask, block_size=bs))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[:, :, :bs], 0.0)


def test_pack_sequences_roundtrip(rng):
    lens = [7, 12, 5, 16, 3]
    seqs = [rng.standard_normal((li, 4)).astype(np.float32) for li in lens]
    packed, seg, index = pack_sequences(seqs, pack_len=16)
    assert packed.shape[1] == 16 and seg.shape == packed.shape[:2]
    for i, s in enumerate(seqs):
        r, off = index[i]
        np.testing.assert_array_equal(packed[r, off : off + lens[i]], s)
        assert (seg[r, off : off + lens[i]] == i + 1).all()
    # pad slots carry the pad id
    assert (seg[packed.sum(-1) == 0] == 0).all()


@pytest.mark.parametrize("causal", [True, False])
def test_packed_attention_matches_per_sequence(rng, causal):
    """Attention over packed rows with segment_ids == attention run on each
    sequence separately (the reference's unpadded-attention guarantee,
    flash_attn/bert_padding.py + flash_attn_unpadded_*)."""
    h, dh = 2, 8
    lens = [10, 6, 16, 4]
    seqs = [rng.standard_normal((li, h * dh)).astype(np.float32) for li in lens]
    packed, seg, index = pack_sequences(seqs, pack_len=16)

    def heads(x):  # (B, L, h*dh) -> (B, h, L, dh)
        b, l, _ = x.shape
        return x.reshape(b, l, h, dh).transpose(0, 2, 1, 3)

    x = jnp.asarray(packed)
    out = mha_reference(
        heads(x), heads(x), heads(x), causal=causal,
        segment_ids=jnp.asarray(seg),
    )
    out = np.asarray(out.transpose(0, 2, 1, 3).reshape(x.shape))
    for i, s in enumerate(seqs):
        xi = jnp.asarray(s)[None]
        ref = mha_reference(heads(xi), heads(xi), heads(xi), causal=causal)
        ref = np.asarray(ref.transpose(0, 2, 1, 3).reshape(xi.shape))[0]
        r, off = index[i]
        np.testing.assert_allclose(
            out[r, off : off + lens[i]], ref, atol=1e-5,
            err_msg=f"sequence {i}",
        )


def test_mha_operator_segment_ids(rng):
    """MHAOperator with packed segment ids == separate forward per sequence."""
    d = 32
    lens = [12, 4]
    seqs = [rng.standard_normal((li, d)).astype(np.float32) for li in lens]
    packed, seg, index = pack_sequences(seqs, pack_len=16)
    op = MHAOperator(d_model=d, num_heads=4, causal=True, impl="xla")
    variables = op.init(jax.random.PRNGKey(0), jnp.asarray(packed))
    y_packed = np.asarray(
        op.apply(variables, jnp.asarray(packed), segment_ids=jnp.asarray(seg))
    )
    for i, s in enumerate(seqs):
        y_i = np.asarray(op.apply(variables, jnp.asarray(s)[None]))[0]
        r, off = index[i]
        np.testing.assert_allclose(
            y_packed[r, off : off + lens[i]], y_i, atol=1e-5
        )


def test_mha_operator_alibi_window_decode_matches_forward(rng):
    """Decode parity holds with ALiBi + sliding window enabled."""
    b, l, d = 2, 16, 32
    op = MHAOperator(
        d_model=d, num_heads=4, causal=True, impl="xla", alibi=True, window=5
    )
    u = jnp.asarray(rng.standard_normal((b, l, d)).astype(np.float32))
    variables = op.init(jax.random.PRNGKey(0), u)
    y_full = op.apply(variables, u, deterministic=True)

    cache = op.init_cache(b, max_length=l)
    ys = []
    for t in range(l):
        y_t, cache = op.apply_step(variables, u[:, t : t + 1], cache, t)
        ys.append(y_t)
    y_inc = jnp.concatenate(ys, axis=1)
    np.testing.assert_allclose(np.asarray(y_inc), np.asarray(y_full), atol=1e-5)


@pytest.mark.parametrize("rotary_dim", [8, 4])  # full and partial rotation
def test_mha_operator_rotary_decode_matches_forward(rng, rotary_dim):
    """Decode parity with rotary embedding (full-head and partial, the
    reference's rotary_emb_dim option in flash_attn/modules/mha.py)."""
    b, l, d = 2, 16, 32
    op = MHAOperator(
        d_model=d, num_heads=4, causal=True, impl="xla", rotary_dim=rotary_dim
    )
    u = jnp.asarray(rng.standard_normal((b, l, d)).astype(np.float32))
    variables = op.init(jax.random.PRNGKey(0), u)
    y_full = op.apply(variables, u, deterministic=True)
    # rotary must actually change the computation
    y_plain = MHAOperator(d_model=d, num_heads=4, causal=True, impl="xla").apply(
        variables, u, deterministic=True
    )
    assert np.abs(np.asarray(y_full) - np.asarray(y_plain)).max() > 1e-3

    cache = op.init_cache(b, max_length=l)
    ys = []
    for t in range(l):
        y_t, cache = op.apply_step(variables, u[:, t : t + 1], cache, t)
        ys.append(y_t)
    y_inc = jnp.concatenate(ys, axis=1)
    np.testing.assert_allclose(np.asarray(y_inc), np.asarray(y_full), atol=1e-5)


def test_mha_operator_decode_matches_forward(rng):
    """KV-cached incremental decoding produces the same outputs as the full
    causal forward (the reference's InferenceParams decode-path guarantee)."""
    b, l, d = 2, 16, 32
    op = MHAOperator(d_model=d, num_heads=4, causal=True, impl="xla")
    u = jnp.asarray(rng.standard_normal((b, l, d)).astype(np.float32))
    variables = op.init(jax.random.PRNGKey(0), u)
    y_full = op.apply(variables, u, deterministic=True)

    cache = op.init_cache(b, max_length=l)
    ys = []
    for t in range(l):
        y_t, cache = op.apply_step(variables, u[:, t : t + 1], cache, t)
        ys.append(y_t)
    y_inc = jnp.concatenate(ys, axis=1)
    np.testing.assert_allclose(np.asarray(y_inc), np.asarray(y_full), atol=1e-5)


@pytest.mark.parametrize("dropout", [0.0, 0.1])
def test_mha_operator_forward_and_grad(rng, dropout):
    b, l, d = 2, 64, 32
    op = MHAOperator(d_model=d, num_heads=4, dropout=dropout)
    u = jnp.asarray(rng.standard_normal((b, l, d)).astype(np.float32))
    variables = op.init(jax.random.PRNGKey(0), u)
    y = op.apply(variables, u, deterministic=True)
    assert y.shape == u.shape

    def loss(params):
        out = op.apply(
            {"params": params},
            u,
            deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return jnp.sum(out**2)

    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
