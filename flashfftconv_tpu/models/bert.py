"""M2-BERT: Monarch Mixer BERT encoder + MLM head (flax).

Port of the reference's M2-BERT model
(/root/reference/examples/bert/bert_layers.py: BertEncoder with shared
FlashFFTConv at 438/294-302, BertModel, BertForMaskedLM) with the
MonarchMixerSequenceMixing token mixer (models.m2_bert) and block-diagonal
(Monarch) MLPs. Attention-free: sequence mixing is the gated bidirectional
long conv, so no ALiBi/unpadding machinery is needed on TPU — static shapes
with an attention-free mixer handle padded batches via the input mask.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from flashfftconv_tpu.models.m2_bert import MonarchMixerSequenceMixing, BlockdiagLinear


class M2BertLayer(nn.Module):
    d_model: int
    d_inner: int
    l_max: int
    mlp_nblocks: int = 4
    dropout: float = 0.1
    bidirectional: bool = True
    residual_long_conv: bool = True
    use_glu_mlp: bool = False  # gated-linear-unit MLP (the reference's
    # BertGatedLinearUnitMLP, bert_layers.py:169-219)
    ref_structure: bool = False  # reproduce the reference BertLayer exactly
    # (bert_layers.py:277-283): NO residual/LayerNorm/dropout around the
    # mixer — its output feeds the MLP directly, and the only per-layer norm
    # is the post-MLP LN. Used for faithful torch-checkpoint import
    # (utils.checkpoint_import.import_m2_bert_state_dict). The default
    # (False) keeps the pre/post-residual structure this repo trains with.
    conv_dtype: Any = jnp.bfloat16
    impl: str = "auto"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = MonarchMixerSequenceMixing(
            d_model=self.d_model,
            l_max=self.l_max,
            bidirectional=self.bidirectional,
            residual_long_conv=self.residual_long_conv,
            conv_dtype=self.conv_dtype,
            impl=self.impl,
            name="mixer",
        )(x, deterministic=deterministic)
        if self.ref_structure:
            x = h
        else:
            h = nn.Dropout(rate=self.dropout)(h, deterministic=deterministic)
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(
                (x + h).astype(jnp.float32)
            ).astype(x.dtype)

        dense = lambda f, name: (
            BlockdiagLinear(f, nblocks=self.mlp_nblocks, name=name)
            if self.mlp_nblocks
            else nn.Dense(f, dtype=x.dtype, name=name)
        )
        if self.use_glu_mlp:
            gv = dense(2 * self.d_inner, "mlp_fc1")(x)
            gate, val = jnp.split(gv, 2, axis=-1)
            m = (nn.gelu(gate.astype(jnp.float32)) * val.astype(jnp.float32)).astype(x.dtype)
        else:
            m = dense(self.d_inner, "mlp_fc1")(x)
            m = nn.gelu(m.astype(jnp.float32)).astype(x.dtype)
        m = dense(self.d_model, "mlp_fc2")(m)
        m = nn.Dropout(rate=self.dropout)(m, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(
            (x + m).astype(jnp.float32)
        ).astype(x.dtype)
        return x


class M2BertModel(nn.Module):
    """Embeddings + n_layer M2 encoder layers (+ optional pooler)."""

    vocab_size: int
    d_model: int = 768
    n_layer: int = 12
    d_inner: int = 3072
    l_max: int = 128
    type_vocab_size: int = 2
    mlp_nblocks: int = 4
    dropout: float = 0.1
    use_glu_mlp: bool = False
    ref_structure: bool = False
    conv_dtype: Any = jnp.bfloat16
    impl: str = "auto"

    @nn.compact
    def __call__(
        self,
        input_ids,
        token_type_ids=None,
        attention_mask=None,
        deterministic: bool = True,
        embed: nn.Embed | None = None,
    ):
        b, l = input_ids.shape
        if embed is None:
            embed = nn.Embed(self.vocab_size, self.d_model, dtype=self.conv_dtype,
                             name="word_embeddings")
        x = embed(input_ids)
        pos = jnp.arange(l)[None]
        x = x + nn.Embed(self.l_max, self.d_model, dtype=self.conv_dtype,
                         name="position_embeddings")(pos)
        if token_type_ids is not None:
            x = x + nn.Embed(self.type_vocab_size, self.d_model,
                             dtype=self.conv_dtype, name="token_type_embeddings")(
                token_type_ids
            )
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="embed_norm")(
            x.astype(jnp.float32)
        ).astype(self.conv_dtype)
        x = nn.Dropout(rate=self.dropout)(x, deterministic=deterministic)
        if attention_mask is not None:
            x = x * attention_mask[..., None].astype(x.dtype)

        for i in range(self.n_layer):
            x = M2BertLayer(
                d_model=self.d_model,
                d_inner=self.d_inner,
                l_max=self.l_max,
                mlp_nblocks=self.mlp_nblocks,
                dropout=self.dropout,
                use_glu_mlp=self.use_glu_mlp,
                ref_structure=self.ref_structure,
                conv_dtype=self.conv_dtype,
                impl=self.impl,
                name=f"layer_{i}",
            )(x, deterministic=deterministic)
            if attention_mask is not None:
                x = x * attention_mask[..., None].astype(x.dtype)
        return x


class M2BertForMaskedLM(nn.Module):
    vocab_size: int
    d_model: int = 768
    n_layer: int = 12
    d_inner: int = 3072
    l_max: int = 128
    mlp_nblocks: int = 4
    dropout: float = 0.1
    use_glu_mlp: bool = False
    ref_structure: bool = False
    tie_mlm_head: bool = False  # reference ties decoder weight to the word
    # embedding (bert_layers.py:566-568); kept opt-in so the torch-checkpoint
    # importer's untied param tree stays the default
    conv_dtype: Any = jnp.bfloat16
    impl: str = "auto"

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, attention_mask=None,
                 deterministic: bool = True):
        embed = (
            nn.Embed(self.vocab_size, self.d_model, dtype=self.conv_dtype,
                     name="word_embeddings")
            if self.tie_mlm_head
            else None
        )
        h = M2BertModel(
            vocab_size=self.vocab_size,
            d_model=self.d_model,
            n_layer=self.n_layer,
            d_inner=self.d_inner,
            l_max=self.l_max,
            mlp_nblocks=self.mlp_nblocks,
            dropout=self.dropout,
            use_glu_mlp=self.use_glu_mlp,
            ref_structure=self.ref_structure,
            conv_dtype=self.conv_dtype,
            impl=self.impl,
            name="bert",
        )(input_ids, token_type_ids, attention_mask, deterministic, embed=embed)
        h = nn.Dense(self.d_model, dtype=jnp.float32, name="mlm_transform")(
            h.astype(jnp.float32)
        )
        h = nn.gelu(h)
        h = nn.LayerNorm(epsilon=1e-5, name="mlm_norm")(h)
        if self.tie_mlm_head:
            logits = embed.attend(h.astype(embed.dtype)).astype(jnp.float32)
            bias = self.param("mlm_bias", nn.initializers.zeros,
                              (self.vocab_size,), jnp.float32)
            return logits + bias
        return nn.Dense(self.vocab_size, dtype=jnp.float32, name="mlm_head")(h)


# --------------------------------------------------------------------------
# Standard (attention) BERT — the reference's flash_attn/models/bert.py
# family: post-norm encoder layers over flash attention, pooler, tied MLM
# head. Kept alongside M2-BERT so conv <-> attention BERT swaps stay
# config-level, like the reference's create_bert builder.
# --------------------------------------------------------------------------

from flashfftconv_tpu.models.attention import MHAOperator  # noqa: E402


def _gelu_exact(x):
    return nn.gelu(x.astype(jnp.float32), approximate=False)


class BertLayer(nn.Module):
    """Post-norm encoder layer: LN(x + MHA(x)); LN(x + MLP(x))."""

    d_model: int
    d_inner: int
    num_heads: int
    dropout: float = 0.1
    impl: str = "auto"
    alibi: bool = False  # ALiBi instead of learned positions (the reference
    # M2-BERT encoder option, examples/bert/bert_layers.py:286-310)

    @nn.compact
    def __call__(self, x, segment_ids=None, deterministic: bool = True):
        h = MHAOperator(
            d_model=self.d_model, num_heads=self.num_heads, causal=False,
            impl=self.impl, alibi=self.alibi, name="mixer",
        )(x, deterministic=deterministic, segment_ids=segment_ids)
        h = nn.Dropout(rate=self.dropout)(h, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(
            (x + h).astype(jnp.float32)
        ).astype(x.dtype)

        m = nn.Dense(self.d_inner, dtype=x.dtype, name="fc1")(x)
        m = _gelu_exact(m).astype(x.dtype)  # HF/ref BERT: exact-erf GELU
        m = nn.Dense(self.d_model, dtype=x.dtype, name="fc2")(m)
        m = nn.Dropout(rate=self.dropout)(m, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(
            (x + m).astype(jnp.float32)
        ).astype(x.dtype)


class BertModel(nn.Module):
    """Standard BERT encoder (+pooler). attention_mask (B, L) of 1/0 is
    turned into segment ids so padded tokens are invisible to valid ones —
    the static-shape TPU equivalent of the reference's unpadding
    (bert_padding.py) + additive-mask path."""

    vocab_size: int
    d_model: int = 768
    n_layer: int = 12
    d_inner: int = 3072
    num_heads: int = 12
    l_max: int = 512
    type_vocab_size: int = 2
    dropout: float = 0.1
    with_pooler: bool = True
    impl: str = "auto"
    alibi: bool = False  # ALiBi relative-position bias in every layer; the
    # learned absolute position table is skipped (bert_layers.py ALiBi mode)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids,
        token_type_ids=None,
        attention_mask=None,
        deterministic: bool = True,
        embed: nn.Embed | None = None,
    ):
        b, l = input_ids.shape
        if embed is None:
            embed = nn.Embed(self.vocab_size, self.d_model, dtype=self.dtype,
                             name="word_embeddings")
        x = embed(input_ids)
        if not self.alibi:
            pos = jnp.arange(l)[None]
            x = x + nn.Embed(self.l_max, self.d_model, dtype=self.dtype,
                             name="position_embeddings")(pos)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = x + nn.Embed(self.type_vocab_size, self.d_model, dtype=self.dtype,
                         name="token_type_embeddings")(token_type_ids)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="embed_norm")(
            x.astype(jnp.float32)
        ).astype(self.dtype)
        x = nn.Dropout(rate=self.dropout)(x, deterministic=deterministic)

        segment_ids = None
        if attention_mask is not None:
            segment_ids = attention_mask.astype(jnp.int32)

        for i in range(self.n_layer):
            x = BertLayer(
                d_model=self.d_model, d_inner=self.d_inner,
                num_heads=self.num_heads, dropout=self.dropout,
                impl=self.impl, alibi=self.alibi, name=f"layer_{i}",
            )(x, segment_ids=segment_ids, deterministic=deterministic)

        pooled = None
        if self.with_pooler:
            pooled = nn.tanh(
                nn.Dense(self.d_model, dtype=jnp.float32, name="pooler")(
                    x[:, 0].astype(jnp.float32)
                )
            )
        return x, pooled


class BertForMaskedLM(nn.Module):
    """BERT + tied MLM head (transform dense -> exact GELU -> LN -> tied
    decoder with its own bias), matching HF BertForMaskedLM."""

    vocab_size: int
    d_model: int = 768
    n_layer: int = 12
    d_inner: int = 3072
    num_heads: int = 12
    l_max: int = 512
    type_vocab_size: int = 2
    dropout: float = 0.1
    impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, attention_mask=None,
                 deterministic: bool = True):
        # The embedding table lives at the top level so the MLM decoder can
        # tie to it (the ConvLMHeadModel pattern).
        embed = nn.Embed(self.vocab_size, self.d_model, dtype=self.dtype,
                         name="word_embeddings")
        bert = BertModel(
            vocab_size=self.vocab_size, d_model=self.d_model,
            n_layer=self.n_layer, d_inner=self.d_inner,
            num_heads=self.num_heads, l_max=self.l_max,
            type_vocab_size=self.type_vocab_size, dropout=self.dropout,
            with_pooler=False, impl=self.impl, dtype=self.dtype, name="bert",
        )
        h, _ = bert(input_ids, token_type_ids, attention_mask, deterministic,
                    embed=embed)
        h = nn.Dense(self.d_model, dtype=jnp.float32, name="mlm_transform")(
            h.astype(jnp.float32)
        )
        h = _gelu_exact(h)
        h = nn.LayerNorm(epsilon=1e-5, name="mlm_norm")(h)
        bias = self.param("mlm_bias", nn.initializers.zeros, (self.vocab_size,))
        return embed.attend(h.astype(embed.dtype)).astype(jnp.float32) + bias


class BertForSequenceClassification(nn.Module):
    """BERT + pooled classification head (the reference's
    BertForSequenceClassification, bert_layers.py:761)."""

    num_labels: int
    vocab_size: int
    d_model: int = 768
    n_layer: int = 12
    d_inner: int = 3072
    num_heads: int = 12
    l_max: int = 512
    type_vocab_size: int = 2
    dropout: float = 0.1
    alibi: bool = False
    impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, attention_mask=None,
                 deterministic: bool = True):
        _, pooled = BertModel(
            vocab_size=self.vocab_size, d_model=self.d_model,
            n_layer=self.n_layer, d_inner=self.d_inner,
            num_heads=self.num_heads, l_max=self.l_max,
            type_vocab_size=self.type_vocab_size, dropout=self.dropout,
            with_pooler=True, alibi=self.alibi, impl=self.impl,
            dtype=self.dtype, name="bert",
        )(input_ids, token_type_ids, attention_mask, deterministic)
        h = nn.Dropout(rate=self.dropout)(pooled, deterministic=deterministic)
        return nn.Dense(self.num_labels, dtype=jnp.float32, name="classifier")(h)


class BertForPreTraining(nn.Module):
    """BERT + MLM and next-sentence-prediction heads (the reference's
    BertPreTrainingHeads / BertForPreTraining,
    flash_attn/models/bert.py:238-365). Returns (mlm_logits, nsp_logits)."""

    vocab_size: int
    d_model: int = 768
    n_layer: int = 12
    d_inner: int = 3072
    num_heads: int = 12
    l_max: int = 512
    type_vocab_size: int = 2
    dropout: float = 0.1
    impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, attention_mask=None,
                 deterministic: bool = True):
        embed = nn.Embed(self.vocab_size, self.d_model, dtype=self.dtype,
                         name="word_embeddings")
        h, pooled = BertModel(
            vocab_size=self.vocab_size, d_model=self.d_model,
            n_layer=self.n_layer, d_inner=self.d_inner,
            num_heads=self.num_heads, l_max=self.l_max,
            type_vocab_size=self.type_vocab_size, dropout=self.dropout,
            with_pooler=True, impl=self.impl, dtype=self.dtype, name="bert",
        )(input_ids, token_type_ids, attention_mask, deterministic, embed=embed)
        t = nn.Dense(self.d_model, dtype=jnp.float32, name="mlm_transform")(
            h.astype(jnp.float32)
        )
        t = _gelu_exact(t)
        t = nn.LayerNorm(epsilon=1e-5, name="mlm_norm")(t)
        bias = self.param("mlm_bias", nn.initializers.zeros, (self.vocab_size,))
        mlm = embed.attend(t.astype(embed.dtype)).astype(jnp.float32) + bias
        nsp = nn.Dense(2, dtype=jnp.float32, name="nsp_head")(pooled)
        return mlm, nsp
