"""Hyena operator on FlashFFTConv (flax).

Port of the reference's FlashHyenaOperator
(/root/reference/examples/hyena/src/models/sequence/hyena-flashfft.py:211-360)
and the HyenaDNA variant (examples/hyena-dna/hyenadna_flashfftconv.py:215-289):
input projection -> short depthwise conv -> Hyena recurrence of gated long
convolutions with implicit filters -> output projection.

The long convolutions run through one shared FftPlan per model at FFT size
2*l_max (causal: zero-padded, no circular wrap), the model analog of the
reference's single shared FlashFFTConv object (long_conv_lm.py:193-197).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from flashfftconv_tpu.models.filters import HyenaFilter
from flashfftconv_tpu.ops import dispatch
from flashfftconv_tpu.ops.depthwise import depthwise_conv1d
from flashfftconv_tpu.ops.plan import get_plan


class ShortDepthwiseConv(nn.Module):
    """Learnable short depthwise conv (BHL), the flax analog of wrapping
    nn.Conv1d weights in FlashDepthWiseConv1d (hyena-flashfft.py:295-306).
    impl forwards to depthwise_conv1d ('xla' under sequence sharding, where
    GSPMD's conv halo exchange beats gathering for a pallas_call)."""

    channels: int
    kernel_size: int = 3
    padding: int | tuple[int, int] = 1
    impl: str = "auto"

    @nn.compact
    def __call__(self, x, history=None):  # x: (B, D, L)
        w = self.param(
            "weights",
            nn.initializers.uniform(scale=2.0 / (self.channels**0.5)),
            (self.channels, self.kernel_size),
        )
        b = self.param("bias", nn.initializers.zeros, (self.channels,))
        if history is None:
            return depthwise_conv1d(
                x, w, b, padding=self.padding, is_bhl=True, impl=self.impl
            )
        # Causal conv continuing from ``history`` — the last K-1 inputs of
        # the previous L-chunk. Runs the zero-history causal conv on the
        # chunk alone (so the chunk keeps the tileable shape the Pallas
        # kernel wants — concat(carry, chunk) with valid padding does not
        # qualify) and adds the missing cross-boundary terms to the first
        # K-1 outputs: y[t] += sum_{j < K-1-t} w[j] * history[t+j].
        k = self.kernel_size
        y = depthwise_conv1d(
            x, w, b, padding=(k - 1, 0), is_bhl=True, impl=self.impl
        )[..., : x.shape[-1]]
        corr = jnp.stack(
            [
                sum(
                    w[:, j].astype(x.dtype)[None, :] * history[..., t + j]
                    for j in range(k - 1 - t)
                )
                for t in range(k - 1)
            ],
            axis=-1,
        )  # (B, D, K-1)
        pad = [(0, 0)] * (y.ndim - 1) + [(0, y.shape[-1] - (k - 1))]
        return y + jnp.pad(corr.astype(y.dtype), pad)


class HyenaOperator(nn.Module):
    """Hyena recurrence of depth ``order`` (order=2 is the common x1*v conv x2
    form used by M2/HyenaDNA)."""

    d_model: int
    l_max: int
    order: int = 2
    filter_order: int = 64
    dropout: float = 0.0
    filter_dropout: float = 0.0
    short_filter_order: int = 3
    conv_dtype: Any = jnp.bfloat16
    impl: str = "auto"
    filter_args: dict | None = None
    # The HyenaDNA reference uses nn.Linear (with bias) for the in-projection
    # (hyenadna_standalone.py:254); the Hyena-LM reference folds it into the
    # matmul without bias. Enable for checkpoint-import parity with HyenaDNA.
    in_proj_bias: bool = False
    # Sequence-sharded (context-parallel) mode: set seq_mesh to a Mesh whose
    # seq_axis carries the sequence (parallel/seq_conv.py) and the operator
    # trains at lengths no single chip can hold.
    seq_mesh: Any = None
    seq_axis: str = "sp"
    # Short-filter dispatch override. None = 'xla' under sequence sharding,
    # 'auto' otherwise. 'pallas' pins the Pallas kernel family end to end
    # (fwd + fused one-pass bwd): at B=1/L=1M the XLA conv backward's
    # batch-in-sublanes layout pads the (1, D, L) temps 2x (3 GB of pure
    # padding in the r5 probe) — the Pallas path keeps dense layouts.
    short_filter_impl: str | None = None
    # Split the long conv into conv_h_chunks sequential channel blocks
    # (lax.map — depthwise, so exact). Each chunk's backward finishes its
    # dk_f accumulation before the next starts, bounding the live f32
    # spectrum accumulators and kernel spectra to H/chunks channels — a
    # memory lever for single-chip 1M-sequence training where those
    # accumulators are GBs (see .r5logs/hdna_1m_train_scan.log).
    conv_h_chunks: int = 0
    # Cast the implicit filter's output (and its cotangent) to this dtype
    # before the conv. None keeps f32 — the f32 k -> f32 kernel spectrum is
    # a numerics advantage (docs/DESIGN.md) — but at L=1M the f32 k + dk +
    # transpose temps hold ~3 GB, so the single-chip 1M memory config sets
    # bfloat16 here.
    filter_output_dtype: Any = None
    # Chunk the pointwise projections over L (nn.scan + remat, exact): the
    # in-projection -> short-filter segment (a K-1 halo carried between
    # chunks keeps the causal conv exact) and the gate-multiply ->
    # out-projection tail. At B=1/L=1M the unchunked segments hold multiple
    # (B, 3D, L) bf16 tensors AND their cotangents across the conv backward
    # (~6 GB of the mixer's 11.9 GB grad footprint, .r5logs/mem_parts.log).
    proj_l_chunks: int = 0
    # Emit the (chunked) out-projection in f32. When the residual stream is
    # f32, a bf16 mixer output is converted wholesale by the caller — at
    # B=1/L=1M that is a 1 GB f32 convert LIVE NEXT TO its 512 MB bf16
    # source; casting per chunk inside the scan writes f32 directly and the
    # bf16 stacked copy never exists.
    proj_out_f32: bool = False

    @nn.compact
    def __call__(self, u, deterministic: bool = True):
        # u: (B, L, D)
        b, l, d = u.shape
        l_filter = min(l, self.l_max)
        seqlen = 2 * self.l_max  # causal conv: FFT at 2x length
        if self.seq_mesh is not None:
            from flashfftconv_tpu.parallel.seq_conv import seq_fft_conv_padded

            conv = lambda x, k: seq_fft_conv_padded(
                x, k, self.seq_mesh, seqlen=seqlen, axis=self.seq_axis,
                compute_dtype=self.conv_dtype,
            )
        else:
            plan = get_plan(seqlen, jnp.dtype(self.conv_dtype).name)
            conv = lambda x, k: dispatch.fft_conv(plan, x, k, impl=self.impl)
        if self.conv_h_chunks > 1 and self.d_model % self.conv_h_chunks == 0:
            base_conv, c = conv, self.conv_h_chunks

            def conv(x, kk):  # noqa: F811 — chunked wrapper over base_conv
                bsz, hh, ll = x.shape
                xs = x.reshape(bsz, c, hh // c, ll).swapaxes(0, 1)
                ks = kk.reshape(c, hh // c, kk.shape[-1])
                ys = jax.lax.map(lambda ab: base_conv(ab[0], ab[1]), (xs, ks))
                return ys.swapaxes(0, 1).reshape(bsz, hh, ll)

        inner = (self.order + 1) * self.d_model
        u = jnp.swapaxes(u, -1, -2)  # (B, D, L)
        ko = self.short_filter_order
        sf_impl = self.short_filter_impl or (
            "xla" if self.seq_mesh is not None else "auto"
        )
        chunked = self.proj_l_chunks > 1 and l % self.proj_l_chunks == 0
        if chunked:
            # Scanned in_proj -> short-filter over L-chunks; the carry is the
            # previous chunk's last K-1 in-projection columns, so the causal
            # conv over [carry, chunk] with no padding equals the unchunked
            # padding=(K-1, 0) conv exactly (zero carry = the left zero-pad).
            c = self.proj_l_chunks

            def _seg_a(mdl, carry, u_c):  # u_c: (B, D, Lc)
                w_in = mdl.param(
                    "in_proj", nn.initializers.lecun_normal(),
                    (inner, mdl.d_model),
                )
                x_c = jnp.einsum("od,bdl->bol", w_in.astype(u_c.dtype), u_c)
                if mdl.in_proj_bias:
                    b_in = mdl.param("in_proj_b", nn.initializers.zeros, (inner,))
                    x_c = x_c + b_in.astype(x_c.dtype)[None, :, None]
                y_c = ShortDepthwiseConv(
                    inner, ko, impl=sf_impl, name="short_filter"
                )(x_c, history=carry.astype(x_c.dtype))
                # Emit the (order+1) streams pre-split: a single stacked
                # (B, inner, L) output would be re-split downstream into
                # full-size slice copies (1.5 GB x2 live at L=1M) — per-
                # chunk splits are bounded and the big concat never exists.
                y4 = y_c.reshape(
                    y_c.shape[0], mdl.order + 1, mdl.d_model, y_c.shape[-1]
                )
                return x_c[..., -(ko - 1):], tuple(
                    y4[:, i] for i in range(mdl.order + 1)
                )

            carry0 = jnp.zeros((b, inner, ko - 1), u.dtype)
            _, parts = nn.scan(
                nn.remat(_seg_a, prevent_cse=False),
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=2,
                out_axes=2,
            )(self, carry0, u.reshape(b, d, c, l // c))
            splits = [p.reshape(b, self.d_model, l) for p in parts]
        else:
            # In-projection without bias-add, pushed into the matmul like the
            # reference (hyena-flashfft.py:337-339).
            w_in = self.param(
                "in_proj", nn.initializers.lecun_normal(), (inner, self.d_model)
            )
            x = jnp.einsum("od,bdl->bol", w_in.astype(u.dtype), u)
            if self.in_proj_bias:
                b_in = self.param("in_proj_b", nn.initializers.zeros, (inner,))
                x = x + b_in.astype(x.dtype)[None, :, None]

            # Causal left-padding (K-1, 0): the reference builds this as
            # Conv1d(padding=K-1) followed by [..., :l] truncation
            # (hyena.py:273-303, hyenadna_standalone.py:257-279). A symmetric
            # K//2 pad here would leak one future step into every position.
            x = ShortDepthwiseConv(
                inner, ko, padding=(ko - 1, 0), impl=sf_impl,
                name="short_filter",
            )(x)[..., :l]

        if not chunked:
            splits = jnp.split(x, self.order + 1, axis=1)
        *gates, v = splits

        filter_fn = HyenaFilter(
            self.d_model * (self.order - 1),
            order=self.filter_order,
            seq_len=self.l_max,
            dropout=self.filter_dropout,
            **(self.filter_args or {}),
            name="filter",
        )
        k = filter_fn(l_filter)  # (1, L, (order-1)*D)
        if self.filter_output_dtype is not None:
            k = k.astype(self.filter_output_dtype)
        k = k[0].T.reshape(self.order - 1, self.d_model, l_filter)  # (o, D, L)
        bias = filter_fn.bias.reshape(self.order - 1, self.d_model)
        if self.filter_output_dtype is not None:
            # f32 bias would promote bias*v to f32 — a full (B, D, L) f32
            # temp (1 GB at 1M) for a skip-connection add.
            bias = bias.astype(self.filter_output_dtype)

        # Recurrence (safari hyena.py form): v <- conv(v * x_i, k_o) + b_o*(v*x_i)
        for o, gate in enumerate(reversed(gates[1:])):
            v = nn.Dropout(rate=self.dropout)(v * gate, deterministic=deterministic)
            v = conv(v, k[o]) + bias[o][None, :, None] * v
        if chunked:
            # Scanned gate-multiply -> out-projection tail (pointwise in L).
            def _seg_b(mdl, carry, vg):
                y_c = jnp.swapaxes(vg[0] * vg[1], -1, -2)  # (B, Lc, D)
                out_c = nn.Dense(mdl.d_model, dtype=y_c.dtype,
                                 name="out_proj")(y_c)
                if mdl.proj_out_f32:
                    out_c = out_c.astype(jnp.float32)
                return carry, out_c

            c = self.proj_l_chunks
            _, out = nn.scan(
                nn.remat(_seg_b, prevent_cse=False),
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=2,
                out_axes=1,
            )(self, 0, (v.reshape(b, d, c, l // c),
                        gates[0].reshape(b, d, c, l // c)))
            return out.reshape(b, l, self.d_model)
        y = v * gates[0]

        y = jnp.swapaxes(y, -1, -2)  # (B, L, D)
        return nn.Dense(self.d_model, dtype=u.dtype, name="out_proj")(y)
