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

import functools
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _mlp_chunked(x, w1, b1, w2, b2, c, act):
    """fc2(act(fc1(x))) computed (and differentiated) in c L-chunks via
    lax.fori_loop — bounding live fc1/act temps to one chunk WITHOUT a
    scan: nn.scan-of-remat inside the outer block remat consistently
    ballooned the 1M train step by +4-5 GB (stacked per-chunk residuals
    and scan-carry cotangents survive the block backward; measured three
    times, .r5logs/mem_probe_*mlp4*). Saves only x; the backward
    recomputes fc1 per chunk and accumulates dw1/dw2 in f32."""
    rows, d = x.shape
    rc = rows // c

    def fwd_chunk(i, y):
        xc = jax.lax.dynamic_slice_in_dim(x, i * rc, rc)
        hc = act((xc @ w1 + b1).astype(jnp.float32)).astype(x.dtype)
        return jax.lax.dynamic_update_slice_in_dim(y, hc @ w2 + b2, i * rc, 0)

    y0 = jnp.zeros((rows, w2.shape[1]), x.dtype)
    return jax.lax.fori_loop(0, c, fwd_chunk, y0)


def _mlp_chunked_fwd(x, w1, b1, w2, b2, c, act):
    return _mlp_chunked(x, w1, b1, w2, b2, c, act), (x, w1, b1, w2)


def _mlp_chunked_bwd(c, act, res, dy):
    x, w1, b1, w2 = res
    rows, _ = x.shape
    rc = rows // c
    f32 = jnp.float32

    def bwd_chunk(i, carry):
        dx, dw1, db1, dw2, db2 = carry
        xc = jax.lax.dynamic_slice_in_dim(x, i * rc, rc)
        dyc = jax.lax.dynamic_slice_in_dim(dy, i * rc, rc)
        pre = (xc @ w1 + b1).astype(f32)
        hc, dact = jax.vjp(lambda p: act(p), pre)
        hc = hc.astype(x.dtype)
        dh = (dyc @ w2.T).astype(f32)
        dpre = dact(dh)[0].astype(x.dtype)
        dx = jax.lax.dynamic_update_slice_in_dim(dx, dpre @ w1.T, i * rc, 0)
        dw1 = dw1 + (xc.T @ dpre).astype(f32)
        db1 = db1 + dpre.astype(f32).sum(0)
        dw2 = dw2 + (hc.T @ dyc).astype(f32)
        db2 = db2 + dyc.astype(f32).sum(0)
        return dx, dw1, db1, dw2, db2

    z = lambda a: jnp.zeros(a.shape, f32)
    dx0 = jnp.zeros(x.shape, x.dtype)
    dx, dw1, db1, dw2, db2 = jax.lax.fori_loop(
        0, c, bwd_chunk, (dx0, z(w1), z(b1), z(w2), jnp.zeros((w2.shape[1],), f32))
    )
    return (dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b1.dtype))


_mlp_chunked.defvjp(_mlp_chunked_fwd, _mlp_chunked_bwd)


class _DenseParams(nn.Module):
    """Parameter holder with nn.Dense's exact tree ({kernel, bias}) and
    default initializers, for layers whose compute runs outside flax."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class ChunkedMlp(nn.Module):
    """Mlp with the L-chunked custom-VJP body (see _mlp_chunked). Same
    param tree as Mlp (fc1/fc2 with Dense-shaped {kernel, bias})."""

    d_inner: int
    d_model: int
    l_chunks: int = 4
    activation: Callable = nn.gelu

    @nn.compact
    def __call__(self, x):
        b, l, d = x.shape
        w1, b1 = _DenseParams(d, self.d_inner, name="fc1")()
        w2, b2 = _DenseParams(self.d_inner, self.d_model, name="fc2")()
        y = _mlp_chunked(
            x.reshape(b * l, d),
            w1.astype(x.dtype), b1.astype(x.dtype),
            w2.astype(x.dtype), b2.astype(x.dtype),
            self.l_chunks, self.activation,
        )
        return y.reshape(b, l, self.d_model)


# (An nn.scan-of-remat chunked Mlp was built first and REMOVED: under the
# outer block remat it consistently grew the 1M train step by +4-5 GB —
# .r5logs/mem_probe_*mlp4*; the custom-VJP form above is what shipped.
# Code in git history: grep chunked_mlp.)


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
    # Nested checkpointing: remat the mixer and the MLP as SEPARATE regions
    # inside the (already rematted) block, so during the block backward the
    # mixer's and the MLP's recomputed working sets never coexist — peak
    # becomes max(mixer bwd, mlp bwd) instead of their union, at the cost
    # of one extra forward recompute of each part. A 1M-sequence memory
    # lever; off by default (extra recompute).
    inner_remat: bool = False

    def setup(self):
        # setup-style (not nn.compact) so `step` can share the submodules
        # for KV-cached incremental decoding; explicit name= keeps the param
        # tree identical to the original compact layout.
        self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")
        mixer_cls = get_mixer_cls(self.mixer)
        if self.inner_remat:
            mixer_cls = nn.remat(mixer_cls, prevent_cse=False,
                                 static_argnums=(2,))
        self.mixer_mod = mixer_cls(
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
            if self.mlp_l_chunks > 1 and not self.mlp_nblocks:
                mlp_cls = ChunkedMlp
                kw = dict(d_inner=self.d_inner, d_model=self.d_model,
                          l_chunks=self.mlp_l_chunks, activation=act)
            else:
                mlp_cls = Mlp
                kw = dict(d_inner=self.d_inner, d_model=self.d_model,
                          nblocks=self.mlp_nblocks, activation=act)
            if self.inner_remat:
                mlp_cls = nn.remat(mlp_cls, prevent_cse=False)
            self.mlp_mod = mlp_cls(name="mlp", **kw)
        self.drop = nn.Dropout(rate=self.resid_dropout)

    def __call__(self, x, deterministic: bool = True):
        dtype = x.dtype
        res = x.astype(jnp.float32) if self.residual_f32 else x
        h = self.norm1(res).astype(dtype)
        # positional deterministic: nn.remat static_argnums counts
        # positional args (inner_remat wraps the mixer with (2,)).
        h = self.mixer_mod(h, deterministic)
        h = self.drop(h, deterministic=deterministic)
        res = res + h.astype(res.dtype)

        h = self.norm2(res).astype(dtype)
        if self.moe_kwargs:
            h = self.mlp_mod(h, deterministic=deterministic)
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
    inner_remat: bool = False  # see Block.inner_remat
    ln_f_f32: bool = True  # f32 final norm (False = bf16, a 1M memory lever)
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
            inner_remat=self.inner_remat,
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
        if self.ln_f_f32:
            return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                name="ln_f")(x.astype(jnp.float32))
        # bf16 final norm (stats over only d_model features): the f32 cast
        # of a (B, L, D) stream plus its cotangent is 2 GB at L=1M, feeding
        # a head that casts back to bf16 anyway.
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_f")(x)


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
    inner_remat: bool = False  # see Block.inner_remat
    ln_f_f32: bool = True  # see LMBackbone.ln_f_f32
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
            inner_remat=self.inner_remat,
            ln_f_f32=self.ln_f_f32,
            moe_kwargs=self.moe_kwargs,
            remat=self.remat,
            scan_blocks=self.scan_blocks,
            dtype=self.dtype,
            name="backbone",
        )
        h = backbone(input_ids, deterministic=deterministic, embed=embed)
        # Tied weights: the lm head attends against the embedding table.
        return embed.attend(h.astype(embed.dtype)).astype(jnp.float32)
