"""Checkpoint-import tests: HyenaDNA-style torch state dicts -> flax params.

The reference loads pretrained HyenaDNA weights with key surgery
(/root/reference/examples/hyena-dna/huggingface.py:28-69); these tests build a
synthetic state dict with that exact key layout and verify the mapping,
layout transposes, merge semantics and the end-to-end forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashfftconv_tpu.models.lm import ConvLMHeadModel
from flashfftconv_tpu.utils.checkpoint_import import (
    ImportReport,
    hyenadna_to_flax,
    merge_params,
    normalize_state_dict,
    strip_checkpointing_keys,
)

D, INNER_MLP, VOCAB, LMAX, NLAYER = 32, 64, 16, 128, 2
FILTER_ORDER = 64


def _torch_style_state(rng) -> dict:
    """Synthetic HyenaDNA state dict (numpy stands in for torch tensors)."""
    f = lambda *s: rng.standard_normal(s).astype(np.float32)
    state = {"backbone.embeddings.word_embeddings.weight": f(VOCAB, D)}
    for i in range(NLAYER):
        p = f"backbone.layers.{i}"
        inner = 3 * D  # order=2 -> (order+1)*d_model
        state |= {
            f"{p}.mixer.in_proj.weight": f(inner, D),
            f"{p}.mixer.in_proj.bias": f(inner),
            f"{p}.mixer.short_filter.weight": f(inner, 1, 3),
            f"{p}.mixer.short_filter.bias": f(inner),
            f"{p}.mixer.filter_fn.bias": f(D),
            f"{p}.mixer.filter_fn.pos_emb.z": f(1, LMAX, 3),
            f"{p}.mixer.filter_fn.pos_emb.t": f(1, LMAX, 1),
            f"{p}.mixer.out_proj.weight": f(D, D),
            f"{p}.mixer.out_proj.bias": f(D),
            f"{p}.norm1.weight": f(D),
            f"{p}.norm1.bias": f(D),
            f"{p}.norm2.weight": f(D),
            f"{p}.norm2.bias": f(D),
            f"{p}.mlp.fc1.weight": f(INNER_MLP, D),
            f"{p}.mlp.fc1.bias": f(INNER_MLP),
            f"{p}.mlp.fc2.weight": f(D, INNER_MLP),
            f"{p}.mlp.fc2.bias": f(D),
        }
        # implicit filter MLP: Linear/Sin x3 + final Linear (no bias)
        widths = [(3, FILTER_ORDER), (FILTER_ORDER, FILTER_ORDER), (FILTER_ORDER, FILTER_ORDER)]
        j = 0
        for cin, cout in widths:
            state[f"{p}.mixer.filter_fn.implicit_filter.{j}.weight"] = f(cout, cin)
            state[f"{p}.mixer.filter_fn.implicit_filter.{j}.bias"] = f(cout)
            state[f"{p}.mixer.filter_fn.implicit_filter.{j + 1}.freq"] = f(1, FILTER_ORDER)
            j += 2
        state[f"{p}.mixer.filter_fn.implicit_filter.{j}.weight"] = f(D, FILTER_ORDER)
    state["backbone.ln_f.weight"] = f(D)
    state["backbone.ln_f.bias"] = f(D)
    state["lm_head.weight"] = f(VOCAB, D)  # tied; must be skipped
    return state


def _model():
    return ConvLMHeadModel(
        d_model=D,
        n_layer=NLAYER,
        d_inner=INNER_MLP,
        vocab_size=VOCAB,
        l_max=LMAX,
        mixer="hyena",
        mixer_kwargs={"in_proj_bias": True, "conv_dtype": jnp.float32, "impl": "xla"},
        embed_dropout=0.0,
        dtype=jnp.float32,
    )


def test_key_surgery():
    assert (
        strip_checkpointing_keys("backbone.layers.0.mixer.layer.in_proj.weight")
        == "backbone.layers.0.mixer.in_proj.weight"
    )
    assert (
        strip_checkpointing_keys("backbone.layers.3.mlp.layer.fc1.bias")
        == "backbone.layers.3.mlp.fc1.bias"
    )
    state = normalize_state_dict(
        {"state_dict": {"model.backbone.ln_f.weight": np.zeros(3)}}
    )
    assert list(state) == ["backbone.ln_f.weight"]


def test_hyenadna_import_end_to_end(rng):
    state = _torch_style_state(rng)
    imported, report = hyenadna_to_flax(state)

    # layout checks
    np.testing.assert_array_equal(
        imported["embeddings"]["embedding"],
        state["backbone.embeddings.word_embeddings.weight"],
    )
    np.testing.assert_array_equal(  # Linear -> Dense transpose
        imported["backbone"]["block_0"]["mlp"]["fc1"]["kernel"],
        state["backbone.layers.0.mlp.fc1.weight"].T,
    )
    np.testing.assert_array_equal(  # in_proj keeps (out, in)
        imported["backbone"]["block_0"]["mixer"]["in_proj"],
        state["backbone.layers.0.mixer.in_proj.weight"],
    )
    np.testing.assert_array_equal(  # Conv1d (C,1,K) -> (C,K)
        imported["backbone"]["block_1"]["mixer"]["short_filter"]["weights"],
        state["backbone.layers.1.mixer.short_filter.weight"][:, 0, :],
    )
    np.testing.assert_array_equal(
        imported["backbone"]["ln_f"]["scale"], state["backbone.ln_f.weight"]
    )

    # pos_emb constants and the tied lm head are skipped, nothing else
    assert {k for k in report.skipped if "pos_emb" not in k} == {"lm_head.weight"}
    assert not [k for k in state if k not in report.used and k not in report.skipped]

    # merge over init params and run
    model = _model()
    ids = jnp.asarray(rng.integers(0, VOCAB, (2, LMAX)))
    init = model.init(jax.random.PRNGKey(0), ids)["params"]
    rep = ImportReport()
    params = merge_params(init, imported, rep)
    assert not rep.missing, f"unimported leaves: {rep.missing}"
    logits = model.apply({"params": params}, ids)
    assert logits.shape == (2, LMAX, VOCAB)
    assert np.isfinite(np.asarray(logits, np.float32)).all()

    # the imported weights actually changed the function
    logits0 = model.apply({"params": init}, ids)
    assert float(jnp.abs(logits - logits0).max()) > 1e-3


def test_merge_shape_mismatch_raises(rng):
    state = _torch_style_state(rng)
    state["backbone.ln_f.weight"] = np.zeros(D + 1, np.float32)
    imported, _ = hyenadna_to_flax(state)
    model = _model()
    init = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, LMAX), jnp.int32)
    )["params"]
    with pytest.raises(ValueError, match="shape mismatch"):
        merge_params(init, imported)


@pytest.mark.slow
def test_gpt2_hf_logits_parity():
    """Our GPTLMHeadModel with imported HF GPT-2 weights reproduces the
    transformers (torch CPU) logits — the reference's tests/models/test_gpt.py
    parity bar, run against a small randomly-initialized GPT-2 config (no
    network access for pretrained weights in this environment)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    import jax.numpy as jnp
    import numpy as np

    from flashfftconv_tpu.models.gpt import GPTLMHeadModel
    from flashfftconv_tpu.utils.checkpoint_import import import_gpt2_state_dict

    cfg = transformers.GPT2Config(
        vocab_size=125,  # not a multiple of 8: exercises the padding path
        n_positions=64,
        n_embd=32,
        n_layer=2,
        n_head=4,
        resid_pdrop=0.0,
        embd_pdrop=0.0,
        attn_pdrop=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.GPT2LMHeadModel(cfg).eval()
    ids = torch.randint(0, 125, (2, 48))
    with torch.no_grad():
        ref = hf(ids).logits.numpy()

    params, report = import_gpt2_state_dict(hf.state_dict(), n_layer=2)
    assert not any("ln_1" in k or "c_attn" in k for k in report.skipped)
    model = GPTLMHeadModel(
        d_model=32, n_layer=2, d_inner=128, vocab_size=125, l_max=64,
        num_heads=4, embed_dropout=0.0, resid_dropout=0.0, dtype=jnp.float32,
    )
    out = model.apply({"params": params}, jnp.asarray(ids.numpy()))
    got = np.asarray(out)[..., :125]
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3)


@pytest.mark.slow
def test_opt_hf_logits_parity():
    """OPT import parity vs transformers OPTForCausalLM (torch CPU), with
    word_embed_proj_dim != hidden_size to exercise project_in/project_out —
    the reference's tests/models/test_opt.py bar."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    import jax.numpy as jnp
    import numpy as np

    from flashfftconv_tpu.models.gpt import GPTLMHeadModel
    from flashfftconv_tpu.utils.checkpoint_import import import_opt_state_dict

    cfg = transformers.OPTConfig(
        vocab_size=120,
        hidden_size=32,
        num_hidden_layers=2,
        ffn_dim=128,
        num_attention_heads=4,
        max_position_embeddings=64,
        word_embed_proj_dim=16,
        activation_function="relu",
        dropout=0.0,
        do_layer_norm_before=True,
    )
    torch.manual_seed(0)
    hf = transformers.OPTForCausalLM(cfg).eval()
    ids = torch.randint(0, 120, (2, 40))
    with torch.no_grad():
        ref = hf(ids).logits.numpy()

    params, report = import_opt_state_dict(hf.state_dict(), n_layer=2)
    assert report.skipped == ["lm_head.weight"] or "lm_head.weight" in report.skipped
    model = GPTLMHeadModel(
        d_model=32, n_layer=2, d_inner=128, vocab_size=120, l_max=64,
        num_heads=4, embed_dim=16, mlp_activation="relu",
        embed_dropout=0.0, resid_dropout=0.0, dtype=jnp.float32,
    )
    out = model.apply({"params": params}, jnp.asarray(ids.numpy()))
    got = np.asarray(out)[..., :120]
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3)


@pytest.mark.slow
def test_gpt2_greedy_generation_parity():
    """Greedy generation with imported GPT-2 weights matches HF generate —
    the reference's tests/models/test_gpt_generation.py analog."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    import jax.numpy as jnp
    import numpy as np

    from flashfftconv_tpu.models.gpt import GPTLMHeadModel
    from flashfftconv_tpu.utils.checkpoint_import import import_gpt2_state_dict
    from flashfftconv_tpu.utils.generation import generate

    cfg = transformers.GPT2Config(
        vocab_size=96, n_positions=64, n_embd=32, n_layer=2, n_head=4,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(1)
    hf = transformers.GPT2LMHeadModel(cfg).eval()
    prompt = torch.randint(0, 96, (2, 10))
    with torch.no_grad():
        ref = hf.generate(
            prompt, max_new_tokens=8, do_sample=False,
            pad_token_id=0,
        ).numpy()

    params, _ = import_gpt2_state_dict(hf.state_dict(), n_layer=2)
    model = GPTLMHeadModel(
        d_model=32, n_layer=2, d_inner=128, vocab_size=96, l_max=64,
        num_heads=4, embed_dropout=0.0, resid_dropout=0.0, dtype=jnp.float32,
    )
    out = generate(
        model.apply, params, jnp.asarray(prompt.numpy()),
        max_new_tokens=8, max_length=64, temperature=0.0,
    )
    np.testing.assert_array_equal(np.asarray(out), ref)


@pytest.mark.slow
def test_vit_hf_logits_parity():
    """ViT import parity vs transformers ViTForImageClassification (torch
    CPU) — the reference's tests/models/test_vit.py bar."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    import jax.numpy as jnp
    import numpy as np

    from flashfftconv_tpu.models.vit import VisionTransformer
    from flashfftconv_tpu.utils.checkpoint_import import import_vit_state_dict

    cfg = transformers.ViTConfig(
        image_size=32, patch_size=8, num_channels=3,
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, layer_norm_eps=1e-5,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        num_labels=10,
    )
    torch.manual_seed(0)
    hf = transformers.ViTForImageClassification(cfg).eval()
    imgs = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        ref = hf(imgs).logits.numpy()

    params, report = import_vit_state_dict(hf.state_dict(), n_layer=2)
    assert not any("attention" in k for k in report.skipped)
    model = VisionTransformer(
        num_classes=10, patch_size=8, d_model=32, n_layer=2, num_heads=4,
        mlp_ratio=2, dropout=0.0, global_pool="token", dtype=jnp.float32,
    )
    out = model.apply({"params": params}, jnp.asarray(imgs.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3, rtol=1e-3)


@pytest.mark.slow
def test_bert_hf_logits_parity():
    """Standard-BERT import parity vs transformers BertForMaskedLM (torch
    CPU), including a padded batch where valid positions must match — the
    reference's tests/models/test_bert.py bar."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    import jax.numpy as jnp
    import numpy as np

    from flashfftconv_tpu.models.bert import BertForMaskedLM
    from flashfftconv_tpu.utils.checkpoint_import import import_bert_state_dict

    cfg = transformers.BertConfig(
        vocab_size=130, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2,
        layer_norm_eps=1e-5, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, hidden_act="gelu",
    )
    torch.manual_seed(0)
    hf = transformers.BertForMaskedLM(cfg).eval()
    ids = torch.randint(0, 130, (2, 24))
    tt = torch.zeros_like(ids)
    tt[:, 12:] = 1
    mask = torch.ones_like(ids)
    mask[0, 20:] = 0  # padded tail on row 0
    with torch.no_grad():
        ref = hf(ids, attention_mask=mask, token_type_ids=tt).logits.numpy()

    params, report = import_bert_state_dict(hf.state_dict(), n_layer=2)
    assert not any("attention" in k for k in report.skipped)
    model = BertForMaskedLM(
        vocab_size=130, d_model=32, n_layer=2, d_inner=64, num_heads=4,
        l_max=64, dropout=0.0, dtype=jnp.float32,
    )
    out = model.apply(
        {"params": params},
        jnp.asarray(ids.numpy()),
        token_type_ids=jnp.asarray(tt.numpy()),
        attention_mask=jnp.asarray(mask.numpy()),
    )
    got = np.asarray(out)
    valid = np.asarray(mask.numpy(), bool)
    np.testing.assert_allclose(got[valid], ref[valid], atol=2e-3, rtol=1e-3)


@pytest.mark.slow
def test_gpt2_kv_generation_matches_full_forward():
    """KV-cached decode (generate_kv) == full-forward generate == HF
    generate, greedy, with imported GPT-2 weights."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    import jax.numpy as jnp
    import numpy as np

    from flashfftconv_tpu.models.gpt import GPTLMHeadModel
    from flashfftconv_tpu.utils.checkpoint_import import import_gpt2_state_dict
    from flashfftconv_tpu.utils.generation import generate, generate_kv

    cfg = transformers.GPT2Config(
        vocab_size=96, n_positions=64, n_embd=32, n_layer=2, n_head=4,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(2)
    hf = transformers.GPT2LMHeadModel(cfg).eval()
    prompt = torch.randint(0, 96, (2, 9))
    with torch.no_grad():
        ref = hf.generate(prompt, max_new_tokens=7, do_sample=False,
                          pad_token_id=0).numpy()

    params, _ = import_gpt2_state_dict(hf.state_dict(), n_layer=2)
    model = GPTLMHeadModel(
        d_model=32, n_layer=2, d_inner=128, vocab_size=96, l_max=64,
        num_heads=4, embed_dropout=0.0, resid_dropout=0.0, dtype=jnp.float32,
    )
    ids = jnp.asarray(prompt.numpy())
    out_kv = generate_kv(model, params, ids, max_new_tokens=7, max_length=64,
                         temperature=0.0)
    out_full = generate(model.apply, params, ids, max_new_tokens=7,
                        max_length=64, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(out_kv), ref)
    np.testing.assert_array_equal(np.asarray(out_full), ref)


# --------------------------------------------------------------------------
# M2-BERT import + checkpoint surgery (reference examples/bert/bert_layers.py,
# training/src/utils/checkpoint.py:32-67)
# --------------------------------------------------------------------------

M2_D, M2_INNER, M2_VOCAB, M2_LMAX, M2_NLAYER, M2_NBLOCKS = 32, 64, 16, 64, 2, 4
M2_ORDER, M2_EMB = 16, 5


def _m2_filter_state(f, prefix: str) -> dict:
    """One reference HyenaFilter (bidirectional=True): shared bias/pos_emb/
    modulation + implicit_filter and implicit_filter_rev Sequentials."""
    state = {
        f"{prefix}.bias": f(M2_D),
        f"{prefix}.pos_emb.z": f(1, M2_LMAX, M2_EMB),
        f"{prefix}.pos_emb.t": f(1, M2_LMAX, 1),
        f"{prefix}.modulation.deltas": f(1, 1, M2_D),
    }
    for seq in ("implicit_filter", "implicit_filter_rev"):
        j = 0
        for cin, cout in ((M2_EMB, M2_ORDER), (M2_ORDER, M2_ORDER), (M2_ORDER, M2_ORDER)):
            state[f"{prefix}.{seq}.{j}.weight"] = f(cout, cin)
            state[f"{prefix}.{seq}.{j}.bias"] = f(cout)
            state[f"{prefix}.{seq}.{j + 1}.freq"] = f(1, M2_ORDER)
            j += 2
        state[f"{prefix}.{seq}.{j}.weight"] = f(M2_D, M2_ORDER)
    return state


def _m2_torch_style_state(rng) -> dict:
    """Synthetic M2-BERT state dict with the reference's exact key layout
    (bert_layers.py: BertForMaskedLM with Monarch mixer + blockdiag MLP)."""
    f = lambda *s: (rng.standard_normal(s) * 0.05).astype(np.float32)
    state = {
        "bert.embeddings.word_embeddings.weight": f(M2_VOCAB, M2_D),
        "bert.embeddings.position_embeddings.weight": f(M2_LMAX, M2_D),
        "bert.embeddings.token_type_embeddings.weight": f(2, M2_D),
        "bert.embeddings.LayerNorm.weight": f(M2_D) + 1.0,
        "bert.embeddings.LayerNorm.bias": f(M2_D),
    }
    for i in range(M2_NLAYER):
        p = f"bert.encoder.layer.{i}"
        state |= {
            f"{p}.attention.in_linear.weight": f(3 * M2_D, M2_D),
            f"{p}.attention.in_linear.bias": f(3 * M2_D),  # unused by fwd
            f"{p}.attention.out_linear.weight": f(M2_D, M2_D),
            f"{p}.attention.out_linear.bias": f(M2_D),
            f"{p}.attention.short_filter.weights": f(3 * M2_D, 3),
            f"{p}.attention.short_filter.bias": f(3 * M2_D),
            # blockdiag MLP: gated_layers (no bias) + wo
            f"{p}.mlp.gated_layers.weight": f(
                M2_NBLOCKS, M2_INNER // M2_NBLOCKS, M2_D // M2_NBLOCKS
            ),
            f"{p}.mlp.wo.weight": f(M2_NBLOCKS, M2_D // M2_NBLOCKS, M2_INNER // M2_NBLOCKS),
            f"{p}.mlp.wo.bias": f(M2_D),
            f"{p}.mlp.layernorm.weight": f(M2_D) + 1.0,
            f"{p}.mlp.layernorm.bias": f(M2_D),
        }
        state |= _m2_filter_state(f, f"{p}.attention.filter_fn")
        state |= _m2_filter_state(f, f"{p}.attention.filter_fn2")
    state |= {
        "bert.pooler.dense.weight": f(M2_D, M2_D),  # skipped: no pooler here
        "bert.pooler.dense.bias": f(M2_D),
        "cls.predictions.transform.dense.weight": f(M2_D, M2_D),
        "cls.predictions.transform.dense.bias": f(M2_D),
        "cls.predictions.transform.LayerNorm.weight": f(M2_D) + 1.0,
        "cls.predictions.transform.LayerNorm.bias": f(M2_D),
        "cls.predictions.decoder.weight": f(M2_VOCAB, M2_D),
        "cls.predictions.bias": f(M2_VOCAB),
    }
    return state


def test_m2_bert_import_end_to_end(rng):
    from flashfftconv_tpu.models.bert import M2BertForMaskedLM
    from flashfftconv_tpu.utils.checkpoint_import import import_m2_bert_state_dict

    state = _m2_torch_style_state(rng)
    imported, report = import_m2_bert_state_dict(state)

    model = M2BertForMaskedLM(
        vocab_size=M2_VOCAB, d_model=M2_D, n_layer=M2_NLAYER, d_inner=M2_INNER,
        l_max=M2_LMAX, mlp_nblocks=M2_NBLOCKS, dropout=0.0, ref_structure=True,
        conv_dtype=jnp.float32, impl="xla",
    )
    ids = jnp.asarray(rng.integers(0, M2_VOCAB, (2, M2_LMAX)))
    init = model.init(jax.random.PRNGKey(0), ids)["params"]
    merged = merge_params(init, imported, report)

    # every checkpoint key is either used or knowingly skipped, exactly once
    assert set(report.used) | set(report.skipped) == set(state)
    assert not (set(report.used) & set(report.skipped))
    skipped = {k for k in report.skipped if "pos_emb" not in k}
    assert skipped == {
        "bert.pooler.dense.weight", "bert.pooler.dense.bias",
        "bert.encoder.layer.0.attention.in_linear.bias",
        "bert.encoder.layer.1.attention.in_linear.bias",
    }
    # layout checks: einsum-oriented in_linear kept (out, in); Dense transposed
    np.testing.assert_array_equal(
        np.asarray(merged["bert"]["layer_0"]["mixer"]["in_linear"]),
        state["bert.encoder.layer.0.attention.in_linear.weight"],
    )
    np.testing.assert_array_equal(
        np.asarray(merged["bert"]["layer_0"]["mixer"]["out_linear"]["kernel"]),
        state["bert.encoder.layer.0.attention.out_linear.weight"].T,
    )
    np.testing.assert_array_equal(
        np.asarray(merged["bert"]["layer_0"]["mlp_fc1"]["weight"]),
        state["bert.encoder.layer.0.mlp.gated_layers.weight"],
    )
    # only init-kept leaves are the rev-filter bias (unused; reference shares
    # the fwd filter's) and gated_layers' absent bias (init zeros = no bias)
    for path in report.missing:
        assert ("filter_rev/bias" in path or "filter2_rev/bias" in path
                or "mlp_fc1/bias" in path), path

    logits = model.apply({"params": merged}, ids, deterministic=True)
    assert logits.shape == (2, M2_LMAX, M2_VOCAB)
    assert np.isfinite(np.asarray(logits)).all()


def test_blockdiag_weight_to_dense_weight_matches_torch(rng):
    import torch

    from flashfftconv_tpu.utils.checkpoint_import import blockdiag_weight_to_dense_weight

    w = rng.standard_normal((4, 8, 6)).astype(np.float32)
    ours = blockdiag_weight_to_dense_weight(w)
    ref = torch.block_diag(*torch.unbind(torch.from_numpy(w), dim=0)).numpy()
    np.testing.assert_array_equal(ours, ref)


def test_blockdiag_to_dense_mlp_equivalence(rng):
    import flax.linen as nn

    from flashfftconv_tpu.models.m2_bert import BlockdiagLinear
    from flashfftconv_tpu.utils.checkpoint_import import blockdiag_to_dense_mlp

    x = jnp.asarray(rng.standard_normal((2, 10, 32)).astype(np.float32))
    bd = BlockdiagLinear(features=64, nblocks=4)
    params = bd.init(jax.random.PRNGKey(1), x)["params"]
    y_bd = bd.apply({"params": params}, x)

    dense_params = blockdiag_to_dense_mlp({"mlp_fc1": params})["mlp_fc1"]
    assert set(dense_params) == {"kernel", "bias"}
    y_dense = nn.Dense(64).apply({"params": dense_params}, x)
    np.testing.assert_allclose(np.asarray(y_bd), np.asarray(y_dense), atol=1e-5)


def test_interpolate_pos_embedding():
    from flashfftconv_tpu.utils.checkpoint_import import interpolate_pos_embedding

    emb = np.arange(12, dtype=np.float32).reshape(1, 4, 3)
    tiled = interpolate_pos_embedding(emb, 8)
    assert tiled.shape == (1, 8, 3)
    np.testing.assert_array_equal(tiled[:, :4], emb)
    np.testing.assert_array_equal(tiled[:, 4:], emb)

    # interleave: 2x2 grid -> 4x4, each source pixel becomes a 2x2 block
    inter = interpolate_pos_embedding(emb, 16, interleave=True)
    assert inter.shape == (1, 16, 3)
    grid_in = emb.reshape(2, 2, 3)
    grid_out = inter.reshape(4, 4, 3)
    for i in range(4):
        for j in range(4):
            np.testing.assert_array_equal(grid_out[i, j], grid_in[i // 2, j // 2])

    with pytest.raises(ValueError):
        interpolate_pos_embedding(emb, 10)  # not a multiple
    with pytest.raises(ValueError):
        interpolate_pos_embedding(emb, 32, interleave=True)  # 32 not square
