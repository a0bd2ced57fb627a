"""Smoke + correctness tests for the model zoo (LongConv, Hyena, M2, H3, LM).

Mirrors the reference's model-level coverage (SURVEY.md §2.5): each mixer
initializes, runs forward at the right shapes, and trains one step with
finite loss/grads. Uses the XLA impl on small shapes (CPU-friendly).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashfftconv_tpu.models.filters import HyenaFilter, positional_embedding
from flashfftconv_tpu.models.h3 import H3Operator
from flashfftconv_tpu.models.hyena import HyenaOperator
from flashfftconv_tpu.models.lm import ConvLMHeadModel
from flashfftconv_tpu.models.long_conv import LongConv, LongConvModel
from flashfftconv_tpu.models.m2_bert import (
    BlockdiagLinear,
    MonarchMixerSequenceMixing,
    bidirectional_kernel,
    blockdiag_multiply,
)

B, L, D = 2, 128, 32
KW = dict(conv_dtype=jnp.float32, impl="xla")


def _init_and_run(model, x, **call_kwargs):
    params = model.init(jax.random.PRNGKey(0), x, **call_kwargs)["params"]
    y = model.apply({"params": params}, x, **call_kwargs)
    assert np.isfinite(np.asarray(y, np.float32)).all()
    return params, y


def _grad_check(model, params, x):
    def loss(p):
        return jnp.sum(model.apply({"params": p}, x).astype(jnp.float32) ** 2)

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(a, np.float32)).all() for a in flat)
    assert any(float(jnp.abs(a.astype(jnp.float32)).max()) > 0 for a in flat)


def test_positional_embedding_shapes():
    z, t = positional_embedding(5, 64)
    assert z.shape == (1, 64, 5) and t.shape == (1, 64, 1)
    with pytest.raises(ValueError):
        positional_embedding(4, 64)


def test_hyena_filter(rng):
    f = HyenaFilter(d_model=D, seq_len=L)
    params = f.init(jax.random.PRNGKey(0), L)["params"]
    k = f.apply({"params": params}, L)
    assert k.shape == (1, L, D)
    assert np.isfinite(np.asarray(k)).all()


def test_blockdiag_multiply_matches_dense(rng):
    nblocks, p, q = 4, 8, 8
    x = jnp.asarray(rng.standard_normal((3, nblocks * p)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((nblocks, q, p)).astype(np.float32))
    y = blockdiag_multiply(x, w)
    # dense equivalent: block-diagonal matrix
    dense = np.zeros((nblocks * q, nblocks * p), np.float32)
    for i in range(nblocks):
        dense[i * q : (i + 1) * q, i * p : (i + 1) * p] = np.asarray(w[i])
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) @ dense.T, atol=1e-5)


def test_bidirectional_kernel(rng):
    k_fwd = jnp.asarray(rng.standard_normal((D, L)).astype(np.float32))
    k_rev = jnp.asarray(rng.standard_normal((D, L)).astype(np.float32))
    k = bidirectional_kernel(k_fwd, k_rev, L)
    assert k.shape == (D, 2 * L)
    np.testing.assert_array_equal(np.asarray(k[:, :L]), np.asarray(k_fwd))
    np.testing.assert_array_equal(np.asarray(k[:, L:]), np.asarray(k_rev)[:, ::-1])


def test_long_conv_layer(rng):
    x = jnp.asarray(rng.standard_normal((B, D, L)).astype(np.float32)) * 0.1
    model = LongConv(h=D, l_max=L, **KW)
    params, y = _init_and_run(model, x)
    assert y.shape == (B, D, L)
    _grad_check(model, params, x)


def test_long_conv_model(rng):
    x = jnp.asarray(rng.standard_normal((B, L, 3)).astype(np.float32))
    model = LongConvModel(d_input=3, d_model=D, n_layers=2, l_max=L, **KW)
    params, y = _init_and_run(model, x)
    assert y.shape == (B, 10)
    _grad_check(model, params, x)


def test_hyena_operator(rng):
    x = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32)) * 0.1
    model = HyenaOperator(d_model=D, l_max=L, **KW)
    params, y = _init_and_run(model, x)
    assert y.shape == (B, L, D)
    _grad_check(model, params, x)


def test_hyena_operator_order3(rng):
    x = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32)) * 0.1
    model = HyenaOperator(d_model=D, l_max=L, order=3, **KW)
    _, y = _init_and_run(model, x)
    assert y.shape == (B, L, D)


@pytest.mark.parametrize("bidirectional", [False, True])
@pytest.mark.parametrize("residual_long_conv", [False, True])
def test_m2_mixer(rng, bidirectional, residual_long_conv):
    x = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32)) * 0.1
    model = MonarchMixerSequenceMixing(
        d_model=D,
        l_max=L,
        bidirectional=bidirectional,
        residual_long_conv=residual_long_conv,
        **KW,
    )
    params, y = _init_and_run(model, x)
    assert y.shape == (B, L, D)
    _grad_check(model, params, x)


def test_m2_mixer_inference_mode(rng):
    x = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32)) * 0.1
    model = MonarchMixerSequenceMixing(d_model=D, l_max=L, inference_mode=True, **KW)
    _, y = _init_and_run(model, x)
    assert y.shape == (B, L, D)


@pytest.mark.parametrize("head_dim", [1, 2])
def test_h3_operator(rng, head_dim):
    x = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32)) * 0.1
    model = H3Operator(d_model=D, l_max=L, head_dim=head_dim, **KW)
    params, y = _init_and_run(model, x)
    assert y.shape == (B, L, D)
    if head_dim == 1:
        _grad_check(model, params, x)


@pytest.mark.parametrize("mixer", ["hyena", "h3", "m2"])
def test_lm_head_model(rng, mixer):
    vocab = 64
    ids = jnp.asarray(rng.integers(0, vocab, (B, L)))
    model = ConvLMHeadModel(
        d_model=D,
        n_layer=2,
        d_inner=2 * D,
        vocab_size=vocab,
        l_max=L,
        mixer=mixer,
        mixer_kwargs=KW,
        dtype=jnp.float32,
    )
    params = model.init(jax.random.PRNGKey(0), ids)["params"]
    logits = model.apply({"params": params}, ids)
    assert logits.shape == (B, L, 64 + 0 if vocab % 8 == 0 else -1) or logits.shape[-1] >= vocab
    assert np.isfinite(np.asarray(logits)).all()

    def loss(p):
        lg = model.apply({"params": p}, ids)
        logp = jax.nn.log_softmax(lg)
        return -jnp.take_along_axis(logp, ids[..., None], axis=-1).mean()

    l0, g = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(l0))
    assert all(
        np.isfinite(np.asarray(a, np.float32)).all()
        for a in jax.tree_util.tree_leaves(g)
    )


def test_lm_weight_tying(rng):
    """lm head must attend against the embedding table (tied weights)."""
    vocab = 64
    ids = jnp.asarray(rng.integers(0, vocab, (1, L)))
    model = ConvLMHeadModel(
        d_model=D, n_layer=1, d_inner=D, vocab_size=vocab, l_max=L,
        mixer="hyena", mixer_kwargs=KW, dtype=jnp.float32,
    )
    params = model.init(jax.random.PRNGKey(0), ids)["params"]
    names = jax.tree_util.tree_map_with_path(lambda p, x: None, params)
    flat = ["/".join(str(getattr(k, "key", k)) for k in path)
            for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]]
    # exactly one embedding table, no separate lm_head kernel
    assert any("embedding" in f for f in flat)
    assert not any("lm_head" in f for f in flat)


def test_m2_bert_mlm(rng):
    from flashfftconv_tpu.models.bert import M2BertForMaskedLM

    vocab = 64
    ids = jnp.asarray(rng.integers(0, vocab, (2, 32)))
    mask = jnp.ones((2, 32), jnp.int32)
    model = M2BertForMaskedLM(
        vocab_size=vocab, d_model=32, n_layer=1, d_inner=64, l_max=32,
        mlp_nblocks=4, conv_dtype=jnp.float32, impl="xla",
    )
    params = model.init(jax.random.PRNGKey(0), ids, attention_mask=mask)["params"]
    logits = model.apply({"params": params}, ids, attention_mask=mask)
    assert logits.shape == (2, 32, vocab)
    assert np.isfinite(np.asarray(logits)).all()

    def loss(p):
        lg = model.apply({"params": p}, ids, attention_mask=mask)
        return jnp.mean((lg - 1.0) ** 2)

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(a)).all() for a in jax.tree_util.tree_leaves(g))


def test_s4d_kernel(rng):
    from flashfftconv_tpu.models.ssm import S4DKernel

    model = S4DKernel(h=8, n_state=16)
    params = model.init(jax.random.PRNGKey(0), 64)["params"]
    k = model.apply({"params": params}, 64)
    assert k.shape == (8, 64)
    kk = np.asarray(k)
    assert np.isfinite(kk).all()
    # decaying SSM kernels: late taps smaller than early on average
    assert np.abs(kk[:, -8:]).mean() < np.abs(kk[:, :8]).mean()


def test_simple_long_conv_kernel(rng):
    from flashfftconv_tpu.models.ssm import SimpleLongConvKernel

    model = SimpleLongConvKernel(h=4)
    params = model.init(jax.random.PRNGKey(0), 32)["params"]
    k = model.apply({"params": params}, 32)
    assert k.shape == (1, 4, 32)


def test_block_fft_matches_fft(rng):
    from flashfftconv_tpu.models.ssm import BlockFFT
    from flashfftconv_tpu.ops.plan import kf_unpermute

    n = 256
    x = rng.standard_normal((2, n)).astype(np.float32)
    model = BlockFFT(n=n, learn_dft=True)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    rr, ri = model.apply({"params": params}, jnp.asarray(x))
    got = kf_unpermute(np.asarray(rr) + 1j * np.asarray(ri), model._plan.factors if hasattr(model, "_plan") else (16, 16))
    ref = np.fft.fft(x)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(got) / scale, ref / scale, atol=1e-5)
    # DFT matrices are trainable parameters
    assert "f1_re" in params


def test_mha_mixer_and_lm(rng):
    from flashfftconv_tpu.models.attention import MHAOperator

    x = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32)) * 0.1
    model = MHAOperator(d_model=D, num_heads=4)
    params, y = _init_and_run(model, x)
    assert y.shape == (B, L, D)
    # causal: output at position t must not depend on inputs after t
    x2 = x.at[:, -1, :].set(100.0)
    y2 = model.apply({"params": params}, x2)
    np.testing.assert_allclose(
        np.asarray(y[:, :-1]), np.asarray(y2[:, :-1]), atol=1e-4
    )

    model_lm = ConvLMHeadModel(
        d_model=D, n_layer=1, d_inner=D, vocab_size=32, l_max=L,
        mixer="mha", mixer_kwargs={"num_heads": 4}, dtype=jnp.float32,
    )
    ids = jnp.asarray(rng.integers(0, 32, (2, L)))
    p = model_lm.init(jax.random.PRNGKey(0), ids)["params"]
    logits = model_lm.apply({"params": p}, ids)
    assert np.isfinite(np.asarray(logits)).all()


def test_fused_ops(rng):
    from flashfftconv_tpu.ops import fused

    x = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((8, 8)).astype(np.float32))
    b = jnp.zeros((8,))
    y = fused.dense_bias_gelu(x, w, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(jax.nn.gelu(x @ w)), atol=1e-5)

    weight, bias = jnp.ones((8,)), jnp.zeros((8,))
    out = fused.dropout_add_layer_norm(x, None, weight, bias, 0.0)
    ref = (x - x.mean(-1, keepdims=True)) / jnp.sqrt(x.var(-1, keepdims=True) + 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    # rotary roundtrip: rotating by theta then -theta is identity
    cos = jnp.cos(jnp.full((4, 4), 0.3))
    sin = jnp.sin(jnp.full((4, 4), 0.3))
    r = fused.apply_rotary_emb(x, cos, sin)
    back = fused.apply_rotary_emb(r, cos, -sin)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)

    logits = jnp.asarray(rng.standard_normal((3, 5, 7)).astype(np.float32))
    labels = jnp.asarray([[0, 1, -100, 3, 4], [1, 1, 1, -100, -100], [2, 2, 2, 2, 2]])
    loss = fused.cross_entropy_loss(logits, labels)
    assert np.isfinite(float(loss))


def test_gpt_lm_forward_and_grad(rng):
    from flashfftconv_tpu.models.gpt import GPTLMHeadModel

    model = GPTLMHeadModel(
        d_model=D, n_layer=2, d_inner=2 * D, vocab_size=16, l_max=L,
        num_heads=4, embed_dropout=0.0, dtype=jnp.float32,
    )
    ids = jnp.asarray(rng.integers(0, 16, (B, L)))
    params, y = _init_and_run(model, ids)
    assert y.shape == (B, L, 16)
    _grad_check(model, params, ids)


def test_opt_embed_projection(rng):
    from flashfftconv_tpu.models.gpt import GPTLMHeadModel

    model = GPTLMHeadModel(
        d_model=D, n_layer=1, d_inner=2 * D, vocab_size=16, l_max=L,
        num_heads=4, embed_dim=D // 2, embed_dropout=0.0, dtype=jnp.float32,
    )
    ids = jnp.asarray(rng.integers(0, 16, (B, L)))
    params, y = _init_and_run(model, ids)
    assert "project_in" in params and "project_out" in params
    assert y.shape == (B, L, 16)


def test_vit_forward_and_grad(rng):
    from flashfftconv_tpu.models.vit import VisionTransformer

    model = VisionTransformer(
        num_classes=10, patch_size=8, d_model=D, n_layer=2, num_heads=4,
        dtype=jnp.float32,
    )
    imgs = jnp.asarray(rng.standard_normal((B, 32, 32, 3)).astype(np.float32))
    params, y = _init_and_run(model, imgs)
    assert y.shape == (B, 10)
    _grad_check(model, params, imgs)


def test_vit_avg_pool(rng):
    from flashfftconv_tpu.models.vit import VisionTransformer

    model = VisionTransformer(
        num_classes=10, patch_size=8, d_model=D, n_layer=1, num_heads=4,
        global_pool="avg", dtype=jnp.float32,
    )
    imgs = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    params, y = _init_and_run(model, imgs)
    assert "cls_token" not in params
    assert y.shape == (1, 10)


def test_moe_mlp_routing_parity(rng):
    """MoEMlp with ample capacity matches a per-token dense top-k mixture
    computed in numpy, for top_k in {1, 2}; aux loss is sown."""
    from flashfftconv_tpu.models.moe import MoEMlp

    b, l, d, f, e = 2, 16, 8, 32, 4
    x = jnp.asarray(rng.standard_normal((b, l, d)).astype(np.float32))
    for top_k in (1, 2):
        m = MoEMlp(d_model=d, d_inner=f, n_experts=e, top_k=top_k,
                   capacity_factor=8.0)
        variables = m.init(jax.random.PRNGKey(0), x)
        y, inter = m.apply(variables, x, mutable=["intermediates"])
        p = variables["params"]
        tok = np.asarray(x).reshape(-1, d)
        logits = tok @ np.asarray(p["gate"]["kernel"]) + np.asarray(p["gate"]["bias"])
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        w1, b1, w2, b2 = (np.asarray(p[k]) for k in ("w1", "b1", "w2", "b2"))
        ref = np.zeros_like(tok)
        for t in range(tok.shape[0]):
            for e_idx in np.argsort(-probs[t])[:top_k]:
                h = np.asarray(jax.nn.gelu(jnp.asarray(tok[t] @ w1[e_idx] + b1[e_idx])))
                ref[t] += probs[t, e_idx] * (h @ w2[e_idx] + b2[e_idx])
        np.testing.assert_allclose(
            np.asarray(y).reshape(-1, d), ref, atol=1e-5
        )
        aux = float(jax.tree.leaves(inter["intermediates"])[0])
        assert np.isfinite(aux) and aux >= 1.0  # >= 1 by Cauchy-Schwarz at k=1


def test_moe_mlp_tight_capacity_drops(rng):
    """With capacity_factor << 1 most tokens are dropped (zero FFN output);
    outputs stay finite and the layer still differentiates."""
    from flashfftconv_tpu.models.moe import MoEMlp

    x = jnp.asarray(rng.standard_normal((2, 16, 8)).astype(np.float32))
    m = MoEMlp(d_model=8, d_inner=16, n_experts=4, top_k=1, capacity_factor=0.25)
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert np.isfinite(np.asarray(y)).all()
    g = jax.grad(
        lambda p: jnp.sum(m.apply({"params": p}, x) ** 2)
    )(variables["params"])
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in jax.tree.leaves(g))


def test_lm_with_moe_ffn(rng):
    """ConvLMHeadModel(moe_kwargs=...) forward + grad, single device."""
    from flashfftconv_tpu.models.lm import ConvLMHeadModel

    model = ConvLMHeadModel(
        d_model=16, n_layer=2, d_inner=32, vocab_size=32, l_max=32,
        mixer="hyena", mixer_kwargs={"impl": "xla", "conv_dtype": jnp.float32},
        moe_kwargs={"n_experts": 4, "top_k": 2}, dtype=jnp.float32,
    )
    ids = jnp.asarray(rng.integers(0, 32, (2, 32)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)["params"]
    logits = model.apply({"params": params}, ids)
    assert logits.shape == (2, 32, 32)
    g = jax.grad(
        lambda p: jnp.sum(model.apply({"params": p}, ids) ** 2)
    )(params)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in jax.tree.leaves(g))


def test_long_conv_kernel_variants():
    """double_exp init, MA smoothing (time + freq), and bandlimit masking
    (reference long_conv_kernel.py:39-77 + the progressive-resizing
    bandlimit hook)."""
    import jax

    from flashfftconv_tpu.models.h3 import LongConvKernel

    h, l = 4, 64
    # double_exp init: kernel magnitude must decay along l for every channel
    mod = LongConvKernel(h=h, l_max=l, weight_init="double_exp", lam=0.0)
    k = mod.apply(mod.init(jax.random.PRNGKey(0)))
    k = np.abs(np.asarray(k))[0]  # (h, l)
    assert k[:, : l // 4].mean() > k[:, -l // 4 :].mean()

    # time-domain MA smoothing: high-frequency energy must drop
    raw = LongConvKernel(h=h, l_max=l, lam=0.0)
    sm = LongConvKernel(h=h, l_max=l, lam=0.0, use_ma_smoothing=True)
    p = raw.init(jax.random.PRNGKey(1))
    k_raw, k_sm = np.asarray(raw.apply(p)), np.asarray(sm.apply(p))
    hf = lambda x: np.abs(np.fft.rfft(x, axis=-1))[..., x.shape[-1] // 4 :].sum()
    assert hf(k_sm) < hf(k_raw)
    assert k_raw.shape == k_sm.shape

    # freq-domain smoothing runs and keeps shape
    smf = LongConvKernel(h=h, l_max=l, lam=0.0, use_ma_smoothing=True,
                         smooth_freq=True)
    assert np.asarray(smf.apply(p)).shape == k_raw.shape

    # bandlimit: frequencies above the kept band are (numerically) zero
    # before the squash; with lam=0 the squash is identity on magnitudes
    bl = LongConvKernel(h=h, l_max=l, lam=0.0, bandlimit=0.25)
    k_bl = np.asarray(bl.apply(p))
    spec = np.abs(np.fft.rfft(k_bl, axis=-1))
    n_bands = l // 2 + 1
    cut = int(0.25 * n_bands)
    assert spec[..., cut + 1 :].max() < 1e-5 * max(spec.max(), 1e-30)


def test_progressive_resizing_schedule():
    from flashfftconv_tpu.utils.train import ProgressiveResizing

    pr = ProgressiveResizing([
        {"resolution": 4, "epochs": 2, "bandlimit": 0.25, "lr_scale": 2.0},
        {"resolution": 2, "epochs": 2},
        {"resolution": 1, "epochs": 3},
    ])
    assert pr.total_epochs == 7
    assert [pr.stage_of(e) for e in range(7)] == [0, 0, 1, 1, 2, 2, 2]
    assert [pr.boundary(e) for e in range(7)] == [
        True, False, True, False, True, False, False]
    x = jnp.arange(32, dtype=jnp.float32).reshape(1, 32)
    assert pr.downsample(x, 0).shape == (1, 8)
    assert pr.downsample(x, 2).shape == (1, 16)
    assert pr.downsample(x, 6).shape == (1, 32)
    np.testing.assert_array_equal(
        np.asarray(pr.downsample(x, 0))[0], np.arange(0, 32, 4))
    assert pr.lr_scale(0) == 2.0 and pr.lr_scale(4) == 1.0
    assert pr.bandlimit(0) == 0.25 and pr.bandlimit(3) is None
    # beyond the schedule: clamps to the last stage (the reference trains
    # any residual epochs at final resolution)
    assert pr.stage_of(100) == 2


def test_progressive_resizing_trains_across_stages():
    """Two-stage curriculum end to end: the same params train at half and
    then full resolution (shorter inputs ride the conv's implicit L<N pad,
    so no parameter surgery at stage boundaries)."""
    import jax
    import optax

    from flashfftconv_tpu.models.long_conv import LongConvModel
    from flashfftconv_tpu.utils.train import (
        ProgressiveResizing, TrainState, create_train_state)

    pr = ProgressiveResizing([
        {"resolution": 2, "epochs": 1},
        {"resolution": 1, "epochs": 1},
    ])
    l_max, b = 32, 4
    model = LongConvModel(d_input=3, d_output=2, d_model=8, n_layers=1,
                          l_max=l_max, conv_dtype=jnp.float32, dropout=0.0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, l_max, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, (b,)))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    tx = optax.adam(1e-2)
    state = create_train_state(params, tx)

    def make_step():
        @jax.jit
        def step(state, xs, ys):
            def loss_fn(p):
                lg = model.apply({"params": p}, xs)
                lp = jax.nn.log_softmax(lg.astype(jnp.float32))
                return -jnp.take_along_axis(lp, ys[:, None], axis=-1).mean()
            loss, g = jax.value_and_grad(loss_fn)(state.params)
            up, os_ = tx.update(g, state.opt_state, state.params)
            return TrainState(step=state.step + 1,
                              params=optax.apply_updates(state.params, up),
                              opt_state=os_), loss
        return step

    losses = []
    for epoch in range(pr.total_epochs):
        if pr.boundary(epoch):
            step = make_step()  # fresh compile at the new shape
        xs = pr.downsample(x, epoch)
        state, loss = step(state, xs, y)
        assert np.isfinite(float(loss))
        losses.append(float(loss))
    assert len(losses) == 2


def test_hyena_operator_is_causal(rng):
    """CausalityMonitor on the real mixer: dy[t]/dx[s>t] == 0 through the
    Hyena operator (reference callbacks/causality_monitor.py applied to its
    primary model)."""
    import jax

    from flashfftconv_tpu.models.hyena import HyenaOperator
    from flashfftconv_tpu.utils.debugging import causality_leakage

    d, l = 16, 32
    op = HyenaOperator(d_model=d, l_max=l, impl="xla")
    x = jnp.asarray(rng.standard_normal((1, l, d)).astype(np.float32) * 0.1)
    variables = op.init(jax.random.PRNGKey(0), x)

    leaks = causality_leakage(lambda u: op.apply(variables, u), x)
    assert max(leaks.values()) < 1e-6, leaks


def test_h3_shift_s4d_kernels(rng):
    """H3 with the original paper's kernel generators (shift SSM for k,
    diagonal S4D SSM for v — reference h3.py via ss_kernel.py modes
    'shift'/'diag') runs forward+grad and stays causal."""
    import jax

    from flashfftconv_tpu.models.h3 import H3Operator
    from flashfftconv_tpu.utils.debugging import causality_leakage

    d, l = 16, 32
    op = H3Operator(
        d_model=d, l_max=l, impl="xla", conv_dtype=jnp.float32,
        k_kernel_type="shift", ssm_kernel_type="s4d", d_state=16,
    )
    x = jnp.asarray(rng.standard_normal((2, l, d)).astype(np.float32) * 0.1)
    variables = op.init(jax.random.PRNGKey(0), x)
    y = op.apply(variables, x)
    assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()

    g = jax.grad(
        lambda p: jnp.sum(op.apply({"params": p}, x).astype(jnp.float32) ** 2)
    )(variables["params"])
    assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree.leaves(g))

    leaks = causality_leakage(lambda u: op.apply(variables, u), x)
    assert max(leaks.values()) < 1e-5, leaks


def test_ssm_inits_and_shift_kernel(rng):
    """HiPPO transitions are the published matrices; dplr 'lin' reproduces
    the S4D-Lin grid; the shift kernel with B=e_1 is the identity on C."""
    from flashfftconv_tpu.models.ssm import (
        SSKernelShift,
        dplr_diag_init,
        hippo_transition,
    )

    a, b = hippo_transition("legs", 4)
    # HiPPO-LegS: A[n, n] = -(n + 1); A[n, k] = -sqrt((2n+1)(2k+1)) for k < n
    np.testing.assert_allclose(np.diag(a), -(np.arange(4) + 1.0), atol=1e-12)
    np.testing.assert_allclose(a[2, 0], -np.sqrt(5 * 1), atol=1e-12)
    assert np.triu(a, 1).max() == 0.0

    w = dplr_diag_init("lin", 8)
    np.testing.assert_allclose(w.real, -0.5)
    np.testing.assert_allclose(w.imag, np.pi * np.arange(4))

    import jax

    sk = SSKernelShift(h=3, d_state=8)
    v = sk.init(jax.random.PRNGKey(0), 20)
    k = sk.apply(v, 20)
    assert k.shape == (1, 3, 20)
    np.testing.assert_allclose(
        np.asarray(k)[..., :8], np.asarray(v["params"]["C"]), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(k)[..., 8:], 0.0, atol=1e-6)


def test_bert_alibi_mode(rng):
    """ALiBi BERT: no learned position table, translation-consistent bias
    (the reference M2-BERT encoder's ALiBi option)."""
    import jax

    from flashfftconv_tpu.models.bert import BertModel

    model = BertModel(vocab_size=64, d_model=32, n_layer=2, d_inner=64,
                      num_heads=4, l_max=32, dropout=0.0, alibi=True,
                      with_pooler=False)
    ids = jnp.asarray(rng.integers(0, 64, size=(2, 16)))
    variables = model.init(jax.random.PRNGKey(0), ids)
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    assert not any("position_embeddings" in "/".join(str(k) for k in path)
                   for path, _ in flat)
    h, _ = model.apply(variables, ids)
    assert h.shape == (2, 16, 32) and np.isfinite(np.asarray(h)).all()


def test_remat_matches_unrematted(rng):
    """remat=True (gradient checkpointing, the reference's torch checkpoint
    wrappers) changes memory, not values: loss and grads match exactly."""
    import jax

    from flashfftconv_tpu.models.lm import ConvLMHeadModel

    ids = jnp.asarray(rng.integers(0, 32, size=(2, 64)))
    kwargs = dict(d_model=32, n_layer=2, d_inner=64, vocab_size=32, l_max=64,
                  mixer="hyena", embed_dropout=0.0, resid_dropout=0.0,
                  dtype=jnp.float32)
    m0 = ConvLMHeadModel(**kwargs)
    m1 = ConvLMHeadModel(**kwargs, remat=True)
    params = m0.init(jax.random.PRNGKey(0), ids)["params"]

    def loss(model, p):
        lg = model.apply({"params": p}, ids)
        return jnp.mean(lg.astype(jnp.float32) ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_bert_heads_and_glu(rng):
    """BertForSequenceClassification / BertForPreTraining heads and the M2
    GLU MLP option run forward + grad."""
    import jax

    from flashfftconv_tpu.models.bert import (
        BertForPreTraining,
        BertForSequenceClassification,
        M2BertLayer,
    )

    ids = jnp.asarray(rng.integers(0, 48, size=(2, 16)))
    cls = BertForSequenceClassification(
        num_labels=3, vocab_size=48, d_model=32, n_layer=1, d_inner=64,
        num_heads=4, l_max=16, dropout=0.0)
    v = cls.init(jax.random.PRNGKey(0), ids)
    out = cls.apply(v, ids)
    assert out.shape == (2, 3)

    pre = BertForPreTraining(
        vocab_size=48, d_model=32, n_layer=1, d_inner=64, num_heads=4,
        l_max=16, dropout=0.0)
    v = pre.init(jax.random.PRNGKey(0), ids)
    mlm, nsp = pre.apply(v, ids)
    assert mlm.shape == (2, 16, 48) and nsp.shape == (2, 2)
    g = jax.grad(lambda p: jnp.sum(pre.apply({"params": p}, ids)[0] ** 2))(
        v["params"])
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))

    x = jnp.asarray(rng.standard_normal((2, 16, 32)).astype(np.float32))
    layer = M2BertLayer(d_model=32, d_inner=64, l_max=16, mlp_nblocks=0,
                        dropout=0.0, use_glu_mlp=True, conv_dtype=jnp.float32)
    v = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(v, x)
    assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()
    assert v["params"]["mlp_fc1"]["kernel"].shape[-1] == 128  # 2 * d_inner


def test_lm_scan_blocks_matches_loop(rng):
    """scan_blocks=True (stacked params, lax.scan over blocks) must produce
    the same logits as the per-block loop given the same weights — the memory
    layout that makes the HyenaDNA-1M train step fit (models/lm.py)."""
    from flashfftconv_tpu.utils.checkpoint_import import (
        stack_block_params,
        unstack_block_params,
    )

    vocab = 64
    n_layer = 3
    ids = jnp.asarray(rng.integers(0, vocab, (B, L)))
    kw = dict(
        d_model=D, n_layer=n_layer, d_inner=2 * D, vocab_size=vocab, l_max=L,
        mixer="hyena", mixer_kwargs=KW, dtype=jnp.float32,
    )
    loop_model = ConvLMHeadModel(**kw)
    scan_model = ConvLMHeadModel(**kw, scan_blocks=True, remat=True)
    params = loop_model.init(jax.random.PRNGKey(0), ids)["params"]
    stacked = stack_block_params(params, n_layer)
    # sanity: the scan model's own init produces the same tree structure
    ref_tree = jax.tree_util.tree_structure(
        jax.eval_shape(lambda: scan_model.init(jax.random.PRNGKey(0), ids))["params"]
    )
    assert jax.tree_util.tree_structure(
        jax.tree_util.tree_map(jnp.asarray, stacked)) == ref_tree

    y_loop = loop_model.apply({"params": params}, ids)
    y_scan = scan_model.apply({"params": stacked}, ids)
    np.testing.assert_allclose(
        np.asarray(y_loop), np.asarray(y_scan), rtol=2e-5, atol=2e-5
    )

    # grads flow through the scanned+rematted stack
    def loss(p):
        lg = scan_model.apply({"params": p}, ids)
        return jnp.sum(lg.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(jax.tree_util.tree_map(jnp.asarray, stacked))
    assert all(np.isfinite(np.asarray(a, np.float32)).all()
               for a in jax.tree_util.tree_leaves(g))

    # round-trip back to the per-block layout
    rt = unstack_block_params(stacked, n_layer)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(rt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hyena_conv_h_chunks_exact(rng):
    """conv_h_chunks (sequential channel blocks via lax.map — the 1M-train
    memory lever) must be EXACT: depthwise conv is independent per channel."""
    u = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32) * 0.1)
    kw = dict(d_model=D, l_max=L, conv_dtype=jnp.float32, impl="xla",
              filter_args={"emb_dim": 5})
    m0 = HyenaOperator(**kw)
    m1 = HyenaOperator(**kw, conv_h_chunks=4)
    p = m0.init(jax.random.PRNGKey(0), u)["params"]
    y0 = m0.apply({"params": p}, u)
    y1 = m1.apply({"params": p}, u)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)
    g0 = jax.grad(lambda p: jnp.sum(m0.apply({"params": p}, u) ** 2))(p)
    g1 = jax.grad(lambda p: jnp.sum(m1.apply({"params": p}, u) ** 2))(p)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_hyena_proj_l_chunks_exact(rng):
    """proj_l_chunks (scanned in_proj/short-filter with K-1 halo carry +
    scanned out-proj tail) must be exact and keep the param tree identical."""
    u = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32) * 0.1)
    kw = dict(d_model=D, l_max=L, conv_dtype=jnp.float32, impl="xla",
              filter_args={"emb_dim": 5})
    m0 = HyenaOperator(**kw)
    m1 = HyenaOperator(**kw, proj_l_chunks=4)
    p = m0.init(jax.random.PRNGKey(0), u)["params"]
    p1 = m1.init(jax.random.PRNGKey(0), u)["params"]
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(p1)
    np.testing.assert_allclose(
        np.asarray(m0.apply({"params": p}, u)),
        np.asarray(m1.apply({"params": p}, u)), atol=1e-5)
    g0 = jax.grad(lambda p: jnp.sum(m0.apply({"params": p}, u) ** 2))(p)
    g1 = jax.grad(lambda p: jnp.sum(m1.apply({"params": p}, u) ** 2))(p)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_hyena_proj_l_chunks_pallas_short_filter(rng):
    """proj_l_chunks + short_filter_impl='pallas' (the HyenaDNA-1M memory
    config): the chunk-local causal Pallas conv plus the explicit K-1
    cross-boundary correction must equal the unchunked operator exactly.
    Shapes are picked so the Pallas path genuinely qualifies (inner=3*128
    divisible by the 128-lane tile; 2048-long chunks fit one L-tile)."""
    d, l = 128, 4096
    u = jnp.asarray(rng.standard_normal((1, l, d)).astype(np.float32) * 0.1)
    kw = dict(d_model=d, l_max=l, conv_dtype=jnp.float32, impl="xla",
              filter_args={"emb_dim": 5})
    m0 = HyenaOperator(**kw)
    m1 = HyenaOperator(**kw, proj_l_chunks=2, short_filter_impl="pallas")
    p = m0.init(jax.random.PRNGKey(0), u)["params"]
    np.testing.assert_allclose(
        np.asarray(m0.apply({"params": p}, u)),
        np.asarray(m1.apply({"params": p}, u)), atol=2e-5)
    g0 = jax.grad(lambda p: jnp.mean(m0.apply({"params": p}, u) ** 2))(p)
    g1 = jax.grad(lambda p: jnp.mean(m1.apply({"params": p}, u) ** 2))(p)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_lm_mlp_l_chunks_matches(rng):
    """mlp_l_chunks: chunked MLP produces the same logits with the SAME
    param tree (broadcast params, no leading scan axis)."""
    vocab = 32
    ids = jnp.asarray(rng.integers(0, vocab, (B, L)))
    kw = dict(d_model=D, n_layer=2, d_inner=2 * D, vocab_size=vocab, l_max=L,
              mixer="hyena", mixer_kwargs=KW, dtype=jnp.float32)
    m0 = ConvLMHeadModel(**kw)
    m1 = ConvLMHeadModel(**kw, mlp_l_chunks=4)
    p = m0.init(jax.random.PRNGKey(0), ids)["params"]
    p1 = m1.init(jax.random.PRNGKey(0), ids)["params"]
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(p1)
    np.testing.assert_allclose(
        np.asarray(m0.apply({"params": p}, ids)),
        np.asarray(m1.apply({"params": p}, ids)), rtol=2e-5, atol=2e-5)
    # The chunked MLP is a custom VJP: all param grads must match too.
    g0 = jax.grad(lambda p: jnp.mean(m0.apply({"params": p}, ids) ** 2))(p)
    g1 = jax.grad(lambda p: jnp.mean(m1.apply({"params": p}, ids) ** 2))(p)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
