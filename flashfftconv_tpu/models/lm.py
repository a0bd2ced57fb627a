"""Causal language model backbone over long-conv sequence mixers (flax).

The TPU port of the reference's LM stack used by both the Hyena LM
(/root/reference/examples/hyena/src/models/sequence/long_conv_lm.py:146-301)
and HyenaDNA (examples/hyena-dna/hyenadna_flashfftconv.py:570-779): word
embeddings -> n_layer pre-norm blocks (sequence mixer + MLP, residual adds,
optionally in f32) -> final layer norm -> tied lm head.

Mixer classes: HyenaOperator (models.hyena), MonarchMixerSequenceMixing
(models.m2_bert), H3Operator (models.h3) — selected by name so configs stay
registry-style (the reference's `_name_` registry, SURVEY.md §5.6).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from flashfftconv_tpu.models.hyena import HyenaOperator
from flashfftconv_tpu.models.m2_bert import BlockdiagLinear, MonarchMixerSequenceMixing


def get_mixer_cls(name: str):
    from flashfftconv_tpu.models.h3 import H3Operator

    from flashfftconv_tpu.models.attention import MHAOperator

    from flashfftconv_tpu.models.long_conv import LongConvOperator

    return {
        "hyena": HyenaOperator,
        "m2": MonarchMixerSequenceMixing,
        "h3": H3Operator,
        "mha": MHAOperator,
        "long-conv": LongConvOperator,
    }[name]


class Mlp(nn.Module):
    """Transformer MLP; set nblocks > 0 for the M2 block-diagonal (Monarch)
    variant (the reference's fused_mlp / BlockdiagLinear MLPs)."""

    d_inner: int
    d_model: int
    nblocks: int = 0
    activation: Callable = nn.gelu

    @nn.compact
    def __call__(self, x):
        dense = (
            (lambda f, name: BlockdiagLinear(f, nblocks=self.nblocks, name=name))
            if self.nblocks
            else (lambda f, name: nn.Dense(f, dtype=x.dtype, name=name))
        )
        y = dense(self.d_inner, "fc1")(x)
        y = self.activation(y.astype(jnp.float32)).astype(x.dtype)
        return dense(self.d_model, "fc2")(y)


class MlpScanCell(Mlp):
    """Mlp with a scan-compatible signature for the L-chunked wrapper."""

    def __call__(self, carry, x):
        return carry, Mlp.__call__(self, x)


def chunked_mlp(l_chunks: int, name: str, **fields):
    """An Mlp applied as lax.scan over l_chunks sequence chunks with remat:
    pointwise over L, so exact, while bounding the live (B, Lc, d_inner)
    activations to one chunk — the 1M-sequence memory lever (the full
    (1, 1M, 1024) fc1 temp is 2 GB bf16). Params are broadcast (no leading
    axis) so the tree matches the plain Mlp.

    Call with x shaped (l_chunks, B, L // l_chunks, D): the scan runs over
    the LEADING axis — lax.scan can only scan axis 0, so a non-leading
    in_axes makes flax transpose the full stacked input AND output (and
    their cotangents in the backward), full-size copies that defeat the
    lever. At B=1 the leading-axis layout is a free reshape."""
    return nn.scan(
        nn.remat(MlpScanCell, prevent_cse=False),
        variable_broadcast="params",
        split_rngs={"params": False},
        in_axes=0,
        out_axes=0,
    )(name=name, **fields)


class Block(nn.Module):
    """Pre-norm block: LN -> mixer -> dropout -> +res; LN -> MLP -> dropout -> +res.
    Residuals carried in f32 (the reference's residual_in_fp32) unless
    residual_f32=False — the memory lever for single-chip 1M-sequence
    training, where each live f32 (B, L, D) residual/cotangent pair costs
    2 GB that bf16 halves (the reference exposes the same choice:
    residual_in_fp32 defaults False in its create_block).

    `moe_kwargs` (e.g. {"n_experts": 8, "top_k": 2, "ep_axis": "ep"}) swaps
    the dense MLP for a mixture-of-experts FFN (models.moe.MoEMlp) — a
    capability beyond the reference, which has no MoE/expert parallelism."""

    d_model: int
    d_inner: int
    mixer: str = "hyena"
    mixer_kwargs: dict | None = None
    resid_dropout: float = 0.0
    mlp_nblocks: int = 0
    moe_kwargs: dict | None = None
    mlp_activation: str = "gelu"  # "relu" for OPT (flash_attn/models/opt.py)
    mlp_l_chunks: int = 0  # L-chunked MLP (see chunked_mlp)
    residual_f32: bool = True

    def setup(self):
        # setup-style (not nn.compact) so `step` can share the submodules
        # for KV-cached incremental decoding; explicit name= keeps the param
        # tree identical to the original compact layout.
        self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")
        self.mixer_mod = get_mixer_cls(self.mixer)(
            d_model=self.d_model, **(self.mixer_kwargs or {}), name="mixer"
        )
        self.norm2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")
        if self.moe_kwargs:
            from flashfftconv_tpu.models.moe import MoEMlp

            self.mlp_mod = MoEMlp(
                d_model=self.d_model, d_inner=self.d_inner,
                **self.moe_kwargs, name="mlp",
            )
        else:
            act = {"gelu": nn.gelu, "relu": nn.relu}[self.mlp_activation]
            fields = dict(d_inner=self.d_inner, d_model=self.d_model,
                          nblocks=self.mlp_nblocks, activation=act)
            if self.mlp_l_chunks > 1:
                self.mlp_mod = chunked_mlp(self.mlp_l_chunks, "mlp", **fields)
            else:
                self.mlp_mod = Mlp(name="mlp", **fields)
        self.drop = nn.Dropout(rate=self.resid_dropout)

    def __call__(self, x, deterministic: bool = True):
        dtype = x.dtype
        res = x.astype(jnp.float32) if self.residual_f32 else x
        h = self.norm1(res).astype(dtype)
        h = self.mixer_mod(h, deterministic=deterministic)
        h = self.drop(h, deterministic=deterministic)
        res = res + h.astype(res.dtype)

        h = self.norm2(res).astype(dtype)
        if self.moe_kwargs:
            h = self.mlp_mod(h, deterministic=deterministic)
        elif self.mlp_l_chunks > 1:
            b_, l_, d_ = h.shape
            c = self.mlp_l_chunks
            # Chunk axis leading (free transpose at B=1; see chunked_mlp).
            xs = jnp.swapaxes(h.reshape(b_, c, l_ // c, d_), 0, 1)
            _, hc = self.mlp_mod(0, xs)
            h = jnp.swapaxes(hc, 0, 1).reshape(b_, l_, d_)
        else:
            h = self.mlp_mod(h)
        h = self.drop(h, deterministic=deterministic)
        res = res + h.astype(res.dtype)
        return res.astype(dtype)

    def step(self, x_t, cache, pos):
        """One KV-cached decode step (mixer must support .step — the "mha"
        mixer does; the reference's InferenceParams layer path)."""
        dtype = x_t.dtype
        res = x_t.astype(jnp.float32)
        h = self.norm1(res).astype(dtype)
        h, cache = self.mixer_mod.step(h, cache, pos)
        res = res + h.astype(jnp.float32)
        h = self.norm2(res).astype(dtype)
        h = self.mlp_mod(h) if not self.moe_kwargs else self.mlp_mod(h, deterministic=True)
        res = res + h.astype(jnp.float32)
        return res.astype(dtype), cache


class BlockScanCell(Block):
    """Block with a scan-compatible (carry, out) signature for nn.scan."""

    def __call__(self, x, deterministic: bool = True):
        return Block.__call__(self, x, deterministic), None


class LMBackbone(nn.Module):
    d_model: int
    n_layer: int
    d_inner: int
    vocab_size: int
    l_max: int
    mixer: str = "hyena"
    mixer_kwargs: dict | None = None
    embed_dropout: float = 0.1
    resid_dropout: float = 0.0
    mlp_nblocks: int = 0
    mlp_l_chunks: int = 0
    residual_f32: bool = True  # see Block.residual_f32
    moe_kwargs: dict | None = None
    remat: bool = False  # gradient checkpointing per block (the reference
    # trains HyenaDNA under torch checkpoint wrappers — the ".mixer.layer"
    # key injection huggingface.py:28-46 is their artifact; here it is
    # jax.checkpoint, trading recompute for activation memory)
    scan_blocks: bool = False  # lax.scan over blocks with stacked params:
    # forces a strictly block-at-a-time backward so only the (B,L,D) carries
    # stay live across layers. Per-block jax.checkpoint alone leaves XLA free
    # to keep every block's MLP temporaries alive at once — the HyenaDNA-1M
    # train step OOM'd that way (19.04G of 15.75G; .r4logs/hdna_1m_train.log)
    # and fits under scan. Param tree: backbone/blocks/* with a leading
    # n_layer axis (use utils.checkpoint_import.stack_block_params to convert).
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, input_ids, deterministic: bool = True, embed: nn.Embed | None = None):
        if embed is None:
            embed = nn.Embed(
                self.vocab_size, self.d_model, dtype=self.dtype, name="embeddings"
            )
        x = embed(input_ids)
        x = nn.Dropout(rate=self.embed_dropout)(x, deterministic=deterministic)
        mixer_kwargs = dict(self.mixer_kwargs or {})
        mixer_kwargs.setdefault("l_max", self.l_max)
        block_fields = dict(
            d_model=self.d_model,
            d_inner=self.d_inner,
            mixer=self.mixer,
            mixer_kwargs=mixer_kwargs,
            resid_dropout=self.resid_dropout,
            mlp_nblocks=self.mlp_nblocks,
            mlp_l_chunks=self.mlp_l_chunks,
            residual_f32=self.residual_f32,
            moe_kwargs=self.moe_kwargs,
        )
        if self.scan_blocks:
            cell = BlockScanCell
            if self.remat:
                # prevent_cse=False: safe (and faster) inside lax.scan.
                cell = nn.remat(cell, static_argnums=(2,), prevent_cse=False)
            blocks = nn.scan(
                cell,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=nn.broadcast,
                length=self.n_layer,
            )(**block_fields, name="blocks")
            x, _ = blocks(x, deterministic)
        else:
            block_cls = nn.remat(Block, static_argnums=(2,)) if self.remat else Block
            for i in range(self.n_layer):
                x = block_cls(**block_fields, name=f"block_{i}")(x, deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_f")(x.astype(jnp.float32))


class ConvLMHeadModel(nn.Module):
    """LM with tied embedding / lm-head weights (long_conv_lm.py:287-290)."""

    d_model: int
    n_layer: int
    d_inner: int
    vocab_size: int
    l_max: int
    mixer: str = "hyena"
    mixer_kwargs: dict | None = None
    embed_dropout: float = 0.1
    resid_dropout: float = 0.0
    mlp_nblocks: int = 0
    mlp_l_chunks: int = 0
    residual_f32: bool = True  # see Block.residual_f32
    moe_kwargs: dict | None = None
    remat: bool = False
    scan_blocks: bool = False
    pad_vocab_size_multiple: int = 8
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, input_ids, deterministic: bool = True):
        vocab = self.vocab_size
        if vocab % self.pad_vocab_size_multiple:
            vocab += self.pad_vocab_size_multiple - vocab % self.pad_vocab_size_multiple
        embed = nn.Embed(vocab, self.d_model, dtype=self.dtype, name="embeddings")
        backbone = LMBackbone(
            d_model=self.d_model,
            n_layer=self.n_layer,
            d_inner=self.d_inner,
            vocab_size=vocab,
            l_max=self.l_max,
            mixer=self.mixer,
            mixer_kwargs=self.mixer_kwargs,
            embed_dropout=self.embed_dropout,
            resid_dropout=self.resid_dropout,
            mlp_nblocks=self.mlp_nblocks,
            mlp_l_chunks=self.mlp_l_chunks,
            residual_f32=self.residual_f32,
            moe_kwargs=self.moe_kwargs,
            remat=self.remat,
            scan_blocks=self.scan_blocks,
            dtype=self.dtype,
            name="backbone",
        )
        h = backbone(input_ids, deterministic=deterministic, embed=embed)
        # Tied weights: the lm head attends against the embedding table.
        return embed.attend(h.astype(embed.dtype)).astype(jnp.float32)
