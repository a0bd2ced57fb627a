"""Tests for the generic sequence-task harness (models/sequence.py,
utils/tasks.py): encoders, pooling, decoders, SequenceModel composition.

Mirrors the behavior of the reference's task plumbing
(/root/reference/examples/hyena/src/tasks/{encoders,decoders}.py,
src/models/sequence/{model,pool}.py) with numpy oracles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashfftconv_tpu.models import sequence as S
from flashfftconv_tpu.utils.tasks import get_task
from flashfftconv_tpu.utils import metrics as M

RNG = np.random.default_rng(0)


def _init_apply(mod, *args, **kwargs):
    params = mod.init(jax.random.PRNGKey(0), *args, **kwargs)
    return mod.apply(params, *args, **kwargs), params


# --- encoders ---------------------------------------------------------------


def test_embedding_and_onehot_encoders():
    ids = jnp.asarray(RNG.integers(0, 17, (2, 12)))
    y, _ = _init_apply(S.EmbeddingEncoder(n_tokens=17, d_model=32), ids)
    assert y.shape == (2, 12, 32)
    y, _ = _init_apply(S.OneHotEncoder(n_tokens=17, d_model=32), ids)
    assert y.shape == (2, 12, 32)
    np.testing.assert_allclose(np.asarray(y).sum(-1), 1.0)
    with pytest.raises(ValueError):
        _init_apply(S.OneHotEncoder(n_tokens=64, d_model=32), ids)


def test_positional_encoder_adds_sinusoids():
    x = jnp.zeros((1, 8, 16), jnp.float32)
    y, _ = _init_apply(S.PositionalEncoder(d_model=16), x)
    # position 0: sin(0)=0 on even dims, cos(0)=1 on odd dims
    np.testing.assert_allclose(np.asarray(y)[0, 0, 0::2], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y)[0, 0, 1::2], 1.0, atol=1e-6)
    assert not np.allclose(np.asarray(y)[0, 1], np.asarray(y)[0, 2])


def test_patch_encoder_shape():
    img = jnp.asarray(RNG.standard_normal((2, 16, 16, 3)), jnp.float32)
    y, _ = _init_apply(S.PatchEncoder(d_model=24, patch_size=4), img)
    assert y.shape == (2, 16, 24)  # (16/4)^2 patches


# --- pooling ----------------------------------------------------------------


def test_down_avg_pool_matches_numpy():
    x = jnp.asarray(RNG.standard_normal((2, 12, 5)), jnp.float32)
    y, _ = _init_apply(S.DownAvgPool(stride=3), x)
    ref = np.asarray(x).reshape(2, 4, 3, 5).mean(2)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-6)


def test_linear_pool_roundtrip_shapes():
    x = jnp.asarray(RNG.standard_normal((2, 12, 6)), jnp.float32)
    y, _ = _init_apply(S.DownLinearPool(stride=2, expand=2), x)
    assert y.shape == (2, 6, 12)
    z, _ = _init_apply(S.UpLinearPool(stride=2, shrink=2), y)
    assert z.shape == (2, 12, 6)


def test_spectral_pool_exact_on_bandlimited_signal():
    # A signal whose spectrum lives strictly below the decimated Nyquist is
    # reproduced exactly by FFT-truncation downsampling: it equals point
    # sampling x[::stride] (classic sampling theorem check).
    l, stride = 64, 4
    t = np.arange(l) / l
    x = (
        np.sin(2 * np.pi * 3 * t) + 0.5 * np.cos(2 * np.pi * 7 * t)
    )  # max band 7 < (l/stride)/2 = 8
    xj = jnp.asarray(np.tile(x[None, :, None], (2, 1, 3)), jnp.float32)
    y, _ = _init_apply(S.DownSpectralPool(stride=stride), xj)
    np.testing.assert_allclose(
        np.asarray(y)[0, :, 0], x[::stride], atol=1e-5
    )


# --- decoders ---------------------------------------------------------------


def test_sequence_decoder_modes_match_numpy():
    x = jnp.asarray(RNG.standard_normal((2, 10, 4)), jnp.float32)
    xn = np.asarray(x)
    for mode, ref in [
        ("last", xn[:, -1]),
        ("first", xn[:, 0]),
        ("mean", xn.mean(1)),
        ("pool", xn.cumsum(1)[:, -1] / 10.0),
        ("sum", xn.cumsum(1)[:, -1]),
    ]:
        y, _ = _init_apply(S.SequenceDecoder(mode=mode), x)
        np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, err_msg=mode)


def test_sequence_decoder_l_output_and_projection():
    x = jnp.asarray(RNG.standard_normal((2, 10, 4)), jnp.float32)
    y, _ = _init_apply(S.SequenceDecoder(mode="last", l_output=3, d_output=7), x)
    assert y.shape == (2, 3, 7)
    y, _ = _init_apply(S.SequenceDecoder(mode="full", d_output=7), x)
    assert y.shape == (2, 10, 7)


def test_sequence_decoder_lengths_masking():
    x = jnp.asarray(RNG.standard_normal((2, 10, 4)), jnp.float32)
    lengths = jnp.asarray([6, 10])
    xn = np.asarray(x)
    y, _ = _init_apply(S.SequenceDecoder(mode="mean"), x, lengths=lengths)
    np.testing.assert_allclose(np.asarray(y)[0], xn[0, :6].mean(0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(y)[1], xn[1].mean(0), rtol=1e-5)
    y, _ = _init_apply(S.SequenceDecoder(mode="last"), x, lengths=lengths)
    np.testing.assert_allclose(np.asarray(y)[0], xn[0, 5], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(y)[1], xn[1, 9], rtol=1e-5)


def test_retrieval_decoder_dual_sequence():
    x = jnp.asarray(RNG.standard_normal((4, 10, 8)), jnp.float32)  # 2 docs x B=2
    y, params = _init_apply(S.RetrievalDecoder(n_classes=3), x)
    assert y.shape == (2, 3)
    # Symmetric in u-v only through |u-v|-free features: swapping the two
    # documents must change the logits (u-v flips sign).
    x_sw = jnp.concatenate([x[2:], x[:2]], axis=0)
    y_sw = S.RetrievalDecoder(n_classes=3).apply(params, x_sw)
    assert not np.allclose(np.asarray(y), np.asarray(y_sw))


# --- SequenceModel ----------------------------------------------------------


def test_sequence_model_classification_end_to_end():
    model = S.SequenceModel(
        d_model=32,
        n_layers=2,
        layer={"mixer": "hyena", "l_max": 16, "filter_order": 16},
        encoder="embedding",
        n_tokens=32,
        decoder={"_name_": "sequence", "mode": "mean", "d_output": 5},
        l_max=16,
    )
    ids = jnp.asarray(RNG.integers(0, 32, (2, 16)))
    params = model.init(jax.random.PRNGKey(0), ids)
    logits = model.apply(params, ids)
    assert logits.shape == (2, 5)

    def loss(p):
        lg = model.apply(p, ids)
        return M.cross_entropy(lg, jnp.asarray([1, 3]))

    g = jax.grad(loss)(params)
    assert all(
        np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g)
    )


def test_sequence_model_staged_pooling():
    model = S.SequenceModel(
        d_model=16,
        n_layers=2,
        n_stages=2,
        pool={"_name_": "avg", "stride": 2},
        layer={"mixer": "hyena", "l_max": 16},
        encoder="linear",
        decoder={"_name_": "sequence", "mode": "mean", "d_output": 3},
        l_max=16,
    )
    x = jnp.asarray(RNG.standard_normal((2, 16, 4)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (2, 3)


def test_sequence_model_via_registry():
    from flashfftconv_tpu.utils.registry import instantiate

    model = instantiate(
        "model",
        {
            "_name_": "sequence",
            "d_model": 16,
            "n_layers": 1,
            "layer": {"mixer": "mha", "num_heads": 2},
            "encoder": "embedding",
            "n_tokens": 16,
            "decoder": {"_name_": "sequence", "mode": "last", "d_output": 4},
        },
    )
    ids = jnp.asarray(RNG.integers(0, 16, (2, 8)))
    params = model.init(jax.random.PRNGKey(0), ids)
    assert model.apply(params, ids).shape == (2, 4)


def test_sequence_model_long_conv_mixer():
    # LongConvOperator adapts the channels-first LongConv layer to the
    # (B, L, D) mixer convention used by lm.Block / SequenceModel.
    model = S.SequenceModel(
        d_model=16,
        n_layers=1,
        layer={"mixer": "long-conv", "mixer_kwargs": {"l_max": 16, "lam": 0.0}},
        encoder="linear",
        decoder={"_name_": "sequence", "mode": "mean", "d_output": 3},
    )
    x = jnp.asarray(RNG.standard_normal((2, 16, 4)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (2, 3)
    g = jax.grad(lambda p: jnp.sum(model.apply(p, x) ** 2))(params)
    assert all(
        np.isfinite(np.asarray(t)).all() for t in jax.tree_util.tree_leaves(g)
    )


# --- tasks ------------------------------------------------------------------


def test_task_bundles():
    lg = jnp.asarray(RNG.standard_normal((4, 9)), jnp.float32)
    tg = jnp.asarray(RNG.integers(0, 9, (4,)))
    t = get_task("classification")
    assert t.decoder_mode == "mean"
    np.testing.assert_allclose(
        float(t.loss(lg, tg)), float(M.cross_entropy(lg, tg)), rtol=1e-6
    )
    assert 0.0 <= float(t.metrics["acc"](lg, tg)) <= 1.0

    # lm-shift: shifted loss equals manual shift
    lg2 = jnp.asarray(RNG.standard_normal((2, 6, 9)), jnp.float32)
    tg2 = jnp.asarray(RNG.integers(0, 9, (2, 6)))
    ts = get_task("lm-shift")
    np.testing.assert_allclose(
        float(ts.loss(lg2, tg2)),
        float(M.cross_entropy(lg2[:, :-1], tg2[:, 1:])),
        rtol=1e-6,
    )

    r = get_task("regression")
    pred = jnp.asarray(RNG.standard_normal((3, 4)), jnp.float32)
    np.testing.assert_allclose(float(r.loss(pred, pred)), 0.0, atol=1e-7)

    with pytest.raises(KeyError):
        get_task("nope")
