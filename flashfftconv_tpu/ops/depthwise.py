"""Short depthwise 1-D convolution (the reference's ``FlashDepthWiseConv1d``).

Reference behavior (/root/reference/flashfftconv/depthwise_1d.py and
csrc/flashfftconv/conv1d/): depthwise conv1d with stride 1, dilation 1, odd
kernel size, symmetric or asymmetric (e.g. causal (K-1, 0)) zero padding,
optional bias, in two layouts:

  - BHL: x (B, D, L), weights (D, K)  -> out (B, D, L + 2*pad - K + 1)
  - BLH: x (B, L, D), weights (K, D)  -> out (B, L + 2*pad - K + 1, D)

Mixed precision is supported as in the reference's 9-way dtype dispatch
(conv1d/shared.h:10-50): activations in {f32, bf16, f16}, weights/bias in any
of the same; compute accumulates in f32 and the output takes the activation
dtype.

On TPU the XLA path below is already strong: a K-tap depthwise conv is K
shifted axpys which XLA fuses into a few VPU passes. A Pallas kernel
(`_pallas_depthwise`) covers the large-D regime where the fused strip pass
wins over XLA's emitter for the INFERENCE forward; under differentiation the
default mode runs the pure-XLA program on both sides — the measured
bandwidth floor for training (see `_bwd_mode` for the on-chip A/B evidence
and `FLASHFFTCONV_DW_BWD` to override).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashfftconv_tpu.ops import plan as plan_mod


def _compiler_params():
    """Raise Mosaic's scoped-VMEM cap to the configured budget (the same
    knob as the long-conv kernels; see plan.VMEM_BUDGET_MB)."""
    return pltpu.CompilerParams(
        vmem_limit_bytes=max(plan_mod.vmem_budget_mb(), 16) * 2**20
    )

# Largest L handled as a single VMEM strip; longer sequences are processed
# in _L_TILE chunks with an XLA-precomputed (k-1)-row halo per chunk edge
# (one extra read of 2*(k-1)*D elements per tile — negligible vs the strip).
_L_TILE = 4096
# BHL places L on the lane axis, where each shifted tap slice materializes
# its own full-width f32 buffer in the fast strip kernel; halving the tile
# keeps k * lt * 4B inside the 16 MB scoped-VMEM budget (observed OOM at
# 4096 with k=7).
_L_TILE_BHL = 2048
_D_TILE = 128


def _d_tile(d: int) -> int:
    """Channel-tile width. MEASURED on v5e (round-4 conv1d A/B log): wider
    tiles (384/512 lanes) consistently LOSE to 128 — e.g. 0.85x vs 1.17x at
    (L=2048, D=768) and 0.84x vs 1.40x at (1024, 8192) — and the (lt, 512)
    bf16 strip blows the 16 MB default scoped-VMEM cap at D=1024. The
    128-lane tile keeps the VPU fully occupied already; wider tiles only
    shrink the grid (less pipeline overlap) without adding bandwidth."""
    return _D_TILE


def _check(weights, bias, k):
    if k % 2 != 1:
        # Parity with the reference constraint (csrc/flashfftconv/conv1d/conv1d.h:67).
        raise ValueError(f"kernel size must be odd, got {k}")
    if bias is not None and bias.shape != weights.shape[:1] and bias.ndim != 1:
        raise ValueError(f"bias shape {bias.shape} incompatible")


def _xla_depthwise(x, w_kd, bias, padding, is_bhl, out_dtype, use_conv=True):
    """Fallback path: grouped lax.conv for 3D inputs (XLA's depthwise conv is
    near bandwidth-bound on TPU for large strips), K shifted multiply-adds
    otherwise.

    use_conv=False (impl='shifts') forces the tap-loop form for 3D inputs
    too: K padded-slice multiply-adds that XLA fuses into one elementwise
    pass, with an equally fusable AD. Exact same math as the grouped conv,
    but with NO convolution op in the graph — which matters at small batch:
    XLA's conv on (1, D, L) picks a batch-in-sublanes layout whose T(2,128)
    tiles are 2x padding (a pure-waste 3 GB temp at D=768/L=1M in the
    HyenaDNA-1M backward, .r5logs/mem_probe_fused.log), while the shift form
    keeps every tensor in the natural dense layout."""
    if isinstance(padding, int):
        padding = (padding, padding)
    k, d = w_kd.shape
    if x.ndim == 3 and use_conv:
        dn = ("NCH", "OIH", "NCH") if is_bhl else ("NHC", "OIH", "NHC")
        # Matching operand dtypes keep the AD transpose of the conv valid
        # (preferred_element_type would make the cotangent dtype mismatch).
        out = lax.conv_general_dilated(
            x,
            w_kd.T[:, None, :].astype(x.dtype),
            window_strides=(1,),
            padding=[padding],
            feature_group_count=d,
            dimension_numbers=dn,
            # f32 inputs get true f32 multiplies (TPU DEFAULT truncates f32
            # conv operands to bf16 passes; the reference CUDA kernels
            # multiply exactly in the storage dtype). The op is bandwidth-
            # bound, so the extra passes are free; for bf16 inputs HIGHEST
            # is a no-op (operands are already exact, accumulation is f32).
            precision=lax.Precision.HIGHEST,
        ).astype(jnp.float32)
        if bias is not None:
            bias_f = bias.astype(jnp.float32)
            out = out + (bias_f[None, :, None] if is_bhl else bias_f[None, None, :])
        return out.astype(out_dtype)

    # f32 math, storage-dtype BOUNDARIES: each tap slice is cast to f32
    # INSIDE the sum (XLA fuses the converts) rather than casting x once up
    # front — an upfront f32 x would make the AD cotangent of x flow in f32
    # too, doubling every (B, D, L) gradient temp (4 x 768 MB of live f32
    # chunk cotangents in the HyenaDNA-1M probe, .r5logs/mem_probe_presplit).
    wf = w_kd.astype(jnp.float32)
    if is_bhl:
        xp = jnp.pad(x, ((0, 0), (0, 0), padding))
        l_out = xp.shape[-1] - k + 1
        out = jnp.zeros(xp.shape[:-1] + (l_out,), jnp.float32)
        for tap in range(k):
            out = out + (xp[..., tap : tap + l_out].astype(jnp.float32)
                         * wf[tap][None, :, None])
        if bias is not None:
            out = out + bias.astype(jnp.float32)[None, :, None]
    else:
        xp = jnp.pad(x, ((0, 0), padding, (0, 0)))
        l_out = xp.shape[1] - k + 1
        out = jnp.zeros((xp.shape[0], l_out, xp.shape[2]), jnp.float32)
        for tap in range(k):
            out = out + (xp[:, tap : tap + l_out, :].astype(jnp.float32)
                         * wf[tap][None, None, :])
        if bias is not None:
            out = out + bias.astype(jnp.float32)[None, None, :]
    return out.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("padding", "is_bhl", "out_dtype"))
def _pallas_depthwise(x, w_kd, bias, padding, is_bhl, out_dtype):
    """Fused Pallas depthwise conv: one bandwidth-bound pass.

    The TPU analog of the reference's conv1d kernels
    (csrc/flashfftconv/conv1d/conv1d_bhl.cu:44-132): each grid step loads an
    (L_tile, D_TILE) channel strip into VMEM and does the K-tap
    multiply-accumulate on the VPU in f32 (weights are scalars per tap), so
    HBM traffic is one read + one write of x. For L > _L_TILE the sequence is
    split into tiles; the (k-1)-row cross-tile halos are gathered by XLA into
    a tiny side array so each strip is still read exactly once.

    Tiled path requires l % _L_TILE == 0 and l == l_out (same-length output,
    i.e. pad_left + pad_right == k-1: the models' "same" and causal convs);
    the wrapper falls back to XLA otherwise.
    """
    k = w_kd.shape[0]
    pl_, pr_ = (padding, padding) if isinstance(padding, int) else padding
    h = k - 1  # halo rows actually needed on each side
    # Halo buffers are padded to Mosaic-friendly tile widths: the halo sits
    # on the sublane axis for BLH (16 rows total => valid bf16 tile) and on
    # the lane axis for BHL (128 lanes total => one full lane tile). hp is
    # the per-side allotment; left halo occupies [hp-h, hp), right [hp, hp+h).
    hp = 64 if is_bhl else 8
    l = x.shape[-1] if is_bhl else x.shape[-2]
    l_out = l + pl_ + pr_ - k + 1
    lmax = _L_TILE_BHL if is_bhl else _L_TILE
    lt = l if l <= lmax else lmax
    nt = l // lt
    axis = x.ndim - 1 if is_bhl else x.ndim - 2

    halos = None
    if nt > 1:
        # halos[:, t] = rows [t*lt - hp, t*lt) ++ [(t+1)*lt, (t+1)*lt + hp)
        # — the hp rows left and right of tile t, zero-filled at the ends.
        halos = _build_halos(x, lt, nt, hp, axis)  # (B, nt, 2hp, D) / (B, nt, D, 2hp)

    if is_bhl:
        b, d, _ = x.shape
        dt = _d_tile(d)
        grid = (b, nt, d // dt)
        x_spec = pl.BlockSpec(
            (1, dt, lt), lambda i, t, j: (i, j, t), memory_space=pltpu.VMEM
        )
        w_spec = pl.BlockSpec(
            (k, dt), lambda i, t, j: (0, j), memory_space=pltpu.VMEM
        )
        b_spec = pl.BlockSpec(
            (1, dt), lambda i, t, j: (0, j), memory_space=pltpu.VMEM
        )
        halo_spec = pl.BlockSpec(
            (1, 1, dt, 2 * hp), lambda i, t, j: (i, t, j, 0),
            memory_space=pltpu.VMEM,
        )
        out_spec = pl.BlockSpec(
            (1, dt, lt if nt > 1 else l_out),
            lambda i, t, j: (i, j, t),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((b, d, l_out), out_dtype)
    else:
        b, _, d = x.shape
        dt = _d_tile(d)
        grid = (b, nt, d // dt)
        x_spec = pl.BlockSpec(
            (1, lt, dt), lambda i, t, j: (i, t, j), memory_space=pltpu.VMEM
        )
        w_spec = pl.BlockSpec(
            (k, dt), lambda i, t, j: (0, j), memory_space=pltpu.VMEM
        )
        b_spec = pl.BlockSpec(
            (1, dt), lambda i, t, j: (0, j), memory_space=pltpu.VMEM
        )
        halo_spec = pl.BlockSpec(
            (1, 1, 2 * hp, dt), lambda i, t, j: (i, t, 0, j),
            memory_space=pltpu.VMEM,
        )
        out_spec = pl.BlockSpec(
            (1, lt if nt > 1 else l_out, dt),
            lambda i, t, j: (i, t, j),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((b, l_out, d), out_dtype)

    has_bias = bias is not None
    tile_out = lt if nt > 1 else l_out

    # The fast kernel builds ONE extended strip xe = [left halo | tile |
    # right halo] (a single VMEM concat), then each tap is a plain slice +
    # fused multiply-add — ~3 VPU passes per tap instead of the ~8 the
    # zeros+pad+add formulation costs. Needs every tap's shift to land
    # inside the hp-row apron; larger kernels (single-tile only) take the
    # legacy per-tap clamped-slice path.
    fast = pl_ <= hp and k - 1 - pl_ <= hp and tile_out == lt

    def kernel(*refs):
        refs = list(refs)
        x_ref = refs.pop(0)
        halo_ref = refs.pop(0) if nt > 1 else None
        w_ref = refs.pop(0)
        bias_ref = refs.pop(0) if has_bias else None
        o_ref = refs.pop(0)
        ax = 1 if is_bhl else 0
        if fast:
            if halo_ref is not None:
                left = halo_ref[0, 0, :, :hp] if is_bhl else halo_ref[0, 0, :hp, :]
                right = halo_ref[0, 0, :, hp:] if is_bhl else halo_ref[0, 0, hp:, :]
            else:
                zshape = (dt, hp) if is_bhl else (hp, dt)
                left = right = jnp.zeros(zshape, x_ref.dtype)
            # xe stays in the input dtype — a persistent f32 copy at bf16
            # inputs would double its VMEM footprint (observed: scoped-vmem
            # OOM at the BHL L-tile); slices widen transiently at use.
            xe = jnp.concatenate([left, x_ref[0], right], axis=ax)
            acc = jnp.zeros(
                (dt, tile_out) if is_bhl else (tile_out, dt), jnp.float32
            )
            for tap in range(k):
                s = tap - pl_  # out[l] += w[tap] * x[l + s] = xe[hp + l + s]
                if is_bhl:
                    seg = xe[:, hp + s : hp + s + tile_out].astype(jnp.float32)
                    acc = acc + seg * w_ref[tap].astype(jnp.float32)[:, None]
                else:
                    seg = xe[hp + s : hp + s + tile_out, :].astype(jnp.float32)
                    acc = acc + seg * w_ref[tap].astype(jnp.float32)[None, :]
        else:
            # Legacy path: per-tap clamped slices with explicit zero pads;
            # only reachable single-tile (nt == 1), where the sequence edge
            # is the only boundary.
            acc = jnp.zeros(
                (dt, tile_out) if is_bhl else (tile_out, dt), jnp.float32
            )
            for tap in range(k):
                s = tap - pl_
                lo = max(0, -s)
                hi = min(tile_out, lt - s)
                if lo < hi:
                    if is_bhl:
                        seg = x_ref[0, :, lo + s : hi + s].astype(jnp.float32)
                        term = seg * w_ref[tap].astype(jnp.float32)[:, None]
                        acc = acc + jnp.pad(term, ((0, 0), (lo, tile_out - hi)))
                    else:
                        seg = x_ref[0, lo + s : hi + s, :].astype(jnp.float32)
                        term = seg * w_ref[tap].astype(jnp.float32)[None, :]
                        acc = acc + jnp.pad(term, ((lo, tile_out - hi), (0, 0)))
        if has_bias:
            bias_v = bias_ref[0].astype(jnp.float32)
            acc = acc + (bias_v[:, None] if is_bhl else bias_v[None, :])
        o_ref[0] = acc.astype(o_ref.dtype)

    in_specs = [x_spec]
    inputs = [x]
    if nt > 1:
        in_specs.append(halo_spec)
        inputs.append(halos)
    in_specs.append(w_spec)
    inputs.append(w_kd)
    if has_bias:
        in_specs.append(b_spec)
        inputs.append(bias.reshape(1, -1))
    interp = jax.default_backend() != "tpu"
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interp,
        compiler_params=None if interp else _compiler_params(),
    )(*inputs)


def _build_halos(x, lt, nt, hp, axis):
    """(B, nt, 2hp, D)/(B, nt, D, 2hp): the hp rows left and right of each
    length tile, zero-filled at the sequence ends. Built from direct slices
    of x (never a padded copy of the full array — that would cost an extra
    full HBM round trip, which at L-tiled sizes is the dominant traffic)."""
    zshape = list(x.shape)
    zshape[axis] = hp
    zeros = jnp.zeros(zshape, x.dtype)

    def rows(start):
        """x rows [start, start+hp), or zeros when outside the sequence."""
        if start < 0 or start >= x.shape[axis]:
            return zeros
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(start, start + hp)
        return x[tuple(sl)]

    pieces = [
        jnp.concatenate([rows(t * lt - hp), rows((t + 1) * lt)], axis=axis)
        for t in range(nt)
    ]
    return jnp.stack(pieces, axis=1)


# Rows in the padded dk output block: rows [0, k) hold dk taps, row k holds
# dbias; 16 is a Mosaic-legal sublane tile and covers k <= 9 comfortably.
_DK_ROWS = 16

# The fused backward holds ~3 f32 strips plus per-tap temporaries live at
# once. Under Mosaic's 16 MB default cap its tile is half the forward's and
# the strips stay in the input dtype (widened transiently per tap); with a
# raised VMEM budget (plan.VMEM_BUDGET_MB, hardware-probed) the tile matches
# the forward's and both strips are converted to f32 ONCE — the per-tap
# widening costs ~2k extra full-strip VPU passes, which is what left the
# committed backward at 0.47-0.72x of XLA's AD (results_conv1d_v5e.csv).
def _bwd_big() -> bool:
    return plan_mod.vmem_budget_mb() >= 48


def _l_tile_bwd(is_bhl: bool) -> int:
    if _bwd_big():
        return _L_TILE_BHL if is_bhl else _L_TILE
    return 1024 if is_bhl else 2048


@functools.partial(jax.jit, static_argnames=("padding", "is_bhl"))
def _pallas_depthwise_bwd(x, dout, w_kd, padding, is_bhl):
    """Fused one-pass backward: du, dk and dbias from a single read of
    (x, dout) — the TPU analog of the reference's conv1d_backward
    (csrc/flashfftconv/conv1d/conv1d.h:76-96), with dk/dbias accumulated
    across the (batch, length-tile) grid axes into a revisited output block
    instead of the host-side reduction the composite path paid K extra
    passes over x for. Requires the same-length case pl + pr == k-1
    (symmetric "same" or causal (k-1, 0) alike; only the left pad enters
    the tap shifts).

      du[l]   = sum_s w[s] * dout[l + pl - s]
      dk[s]   = sum_{b,l} x[l + s - pl] * dout[l]
      dbias   = sum_{b,l} dout[l]
    """
    pl_, _pr = (padding, padding) if isinstance(padding, int) else padding
    k = w_kd.shape[0]
    hp = 64 if is_bhl else 8
    l = x.shape[-1] if is_bhl else x.shape[-2]
    lmax = _l_tile_bwd(is_bhl)
    lt = l if l <= lmax else lmax
    nt = l // lt
    axis = x.ndim - 1 if is_bhl else x.ndim - 2
    d = x.shape[1] if is_bhl else x.shape[2]
    b = x.shape[0]

    x_halos = dout_halos = None
    if nt > 1:
        x_halos = _build_halos(x, lt, nt, hp, axis)
        dout_halos = _build_halos(dout, lt, nt, hp, axis)

    # Grid: d-tiles outermost so the accumulated dk block's revisits (over
    # b and t) are consecutive.
    dt = _d_tile(d)
    grid = (d // dt, b, nt)
    if is_bhl:
        io_spec = pl.BlockSpec(
            (1, dt, lt), lambda j, i, t: (i, j, t), memory_space=pltpu.VMEM
        )
        halo_spec = pl.BlockSpec(
            (1, 1, dt, 2 * hp), lambda j, i, t: (i, t, j, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        io_spec = pl.BlockSpec(
            (1, lt, dt), lambda j, i, t: (i, t, j), memory_space=pltpu.VMEM
        )
        halo_spec = pl.BlockSpec(
            (1, 1, 2 * hp, dt), lambda j, i, t: (i, t, 0, j),
            memory_space=pltpu.VMEM,
        )
    w_spec = pl.BlockSpec((k, dt), lambda j, i, t: (0, j), memory_space=pltpu.VMEM)
    dk_spec = pl.BlockSpec(
        (_DK_ROWS, dt), lambda j, i, t: (0, j), memory_space=pltpu.VMEM
    )

    def kernel(*refs):
        refs = list(refs)
        x_ref = refs.pop(0)
        dout_ref = refs.pop(0)
        xh_ref = refs.pop(0) if nt > 1 else None
        dh_ref = refs.pop(0) if nt > 1 else None
        w_ref = refs.pop(0)
        du_ref = refs.pop(0)
        dk_ref = refs.pop(0)

        first = (pl.program_id(1) == 0) & (pl.program_id(2) == 0)

        @pl.when(first)
        def _init():
            dk_ref[...] = jnp.zeros_like(dk_ref)

        ax = 1 if is_bhl else 0

        def extended(tile_ref, halo_ref):
            """[left halo | tile | right halo] as one strip — built once, so
            each tap's shifted window is a plain slice instead of a
            zeros+pad+add pass (the bwd kernel was VPU-bound on those).
            With the raised VMEM budget (_bwd_big) the strip is converted
            to f32 HERE, once; under the 16 MB default it stays in the
            input dtype and slices widen transiently at use (a persistent
            f32 strip exceeds the default scoped-VMEM cap)."""
            if halo_ref is not None:
                left = halo_ref[0, 0, :, :hp] if is_bhl else halo_ref[0, 0, :hp, :]
                right = halo_ref[0, 0, :, hp:] if is_bhl else halo_ref[0, 0, hp:, :]
            else:
                zshape = (dt, hp) if is_bhl else (hp, dt)
                left = right = jnp.zeros(zshape, tile_ref.dtype)
            xe = jnp.concatenate([left, tile_ref[0], right], axis=ax)
            return xe.astype(jnp.float32) if _bwd_big() else xe

        def shifted(xe, s):
            """xe rows [hp + s, hp + s + lt) — tile rows l + s — as f32."""
            seg = (
                xe[:, hp + s : hp + s + lt] if is_bhl else xe[hp + s : hp + s + lt, :]
            )
            return seg if _bwd_big() else seg.astype(jnp.float32)

        xe = extended(x_ref, xh_ref)
        de = extended(dout_ref, dh_ref)
        dout_f = shifted(de, 0)  # (DT, lt) bhl / (lt, DT) blh
        l_axis = 1 if is_bhl else 0

        du_acc = jnp.zeros_like(dout_f)
        dk_rows = []
        for tap in range(k):
            wf = w_ref[tap].astype(jnp.float32)
            # du: dout shifted by pl - tap, weighted by w[tap]
            sh = shifted(de, pl_ - tap)
            du_acc = du_acc + sh * (wf[:, None] if is_bhl else wf[None, :])
            # dk[tap]: x shifted by tap - padding, correlated with dout
            dk_rows.append((shifted(xe, tap - pl_) * dout_f).sum(axis=l_axis))
        dk_new = jnp.stack(dk_rows)  # (k, DT)
        dbias_new = dout_f.sum(axis=l_axis)[None]  # (1, DT)
        pad_rows = _DK_ROWS - k - 1
        update = jnp.concatenate(
            [dk_new, dbias_new, jnp.zeros((pad_rows, dt), jnp.float32)]
        )
        dk_ref[...] = dk_ref[...] + update
        du_ref[0] = du_acc.astype(du_ref.dtype)

    in_specs = [io_spec, io_spec]
    inputs = [x, dout]
    if nt > 1:
        in_specs += [halo_spec, halo_spec]
        inputs += [x_halos, dout_halos]
    in_specs.append(w_spec)
    inputs.append(w_kd)
    # du is stored in the activation dtype: the f32 accumulator is rounded
    # once at the store, and writing f32 would double the dominant HBM write.
    du_shape = jax.ShapeDtypeStruct(x.shape, x.dtype)
    dk_shape = jax.ShapeDtypeStruct((_DK_ROWS, d), jnp.float32)
    interp = jax.default_backend() != "tpu"
    du, dk_pad = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[io_spec, dk_spec],
        out_shape=[du_shape, dk_shape],
        interpret=interp,
        compiler_params=None if interp else _compiler_params(),
    )(*inputs)
    return du, dk_pad[:k], dk_pad[k]


def _bwd_mode() -> str:
    """Differentiation-path selection, read at trace time.

      'xla' (default) — under differentiation BOTH the forward and the
        backward run XLA's grouped conv: exactly the lax.conv AD program,
        i.e. the measured bandwidth floor. The round-4 on-chip A/B
        (results_conv1d_v5e_bwdconvs.csv vs the default run) showed every
        Pallas-forward training combination LOSES to that floor — the fused
        one-pass backward at 0.74-0.95x and the transposed-conv composite at
        0.49-0.88x — because the Pallas forward pins x/dout to the default
        {2,1,0} layout while XLA's depthwise emitter wants batch-in-sublanes
        {2,0,1}, so everything downstream of a Pallas forward pays
        full-tensor relayout copies. The inference forward (no grad) keeps
        the Pallas kernel where it wins (see _pallas_profitable).
      'fused' — Pallas forward + the fused one-pass Pallas backward
        (du, dk, dbias from a single read of x/dout).
      'convs' — Pallas forward + XLA transposed-conv composite
        (FLASHFFTCONV_DW_BWD_CONVS=1 is a back-compat alias).
    """
    if os.environ.get("FLASHFFTCONV_DW_BWD_CONVS"):
        return "convs"
    mode = os.environ.get("FLASHFFTCONV_DW_BWD", "xla")
    if mode not in ("xla", "fused", "convs"):
        raise ValueError(f"FLASHFFTCONV_DW_BWD must be xla|fused|convs, got {mode!r}")
    return mode


def _pallas_profitable(d: int, l: int) -> bool:
    """Auto-dispatch profitability gate for the (inference) forward.
    MEASURED on v5e (results_conv1d_v5e_r4.csv — scan-amortized timing, K=5,
    B=16, L 1K-8K): the Pallas forward wins 1.1-1.9x at D >= 1024 once the
    strip is big enough (L*D >= 4M elements), but loses or ties below that
    ((1024, 2048) 0.78x, (2048, 1024) 0.98x) and always loses at D=768
    (0.59-0.91x — XLA's emitter handles the 6-lane-tile channel count
    better than the 128-lane-tile grid). CPU/interpret keeps the Pallas
    path so the test suite covers the kernels."""
    return jax.default_backend() != "tpu" or (d >= 1024 and l * d >= 4 * 2**20)


def _pallas_ok(x, d, l, padding, k, is_bhl) -> bool:
    pl_, pr_ = (padding, padding) if isinstance(padding, int) else padding
    if d % _D_TILE != 0 or pl_ > k - 1 or pr_ > k - 1:
        return False
    lmax = _L_TILE_BHL if is_bhl else _L_TILE
    if l <= lmax:
        return True
    # Tiled path: uniform tiles, same-length output (the "same" and causal
    # convs the models use), and a kernel that fits the per-side halo
    # allotment; other shapes take the XLA path.
    return l % lmax == 0 and pl_ + pr_ == k - 1 and k - 1 <= 8


def depthwise_conv1d(
    x: jax.Array,
    weights: jax.Array,
    bias: jax.Array | None = None,
    padding: int | tuple[int, int] = 0,
    is_bhl: bool = True,
    impl: str = "auto",
) -> jax.Array:
    """Depthwise conv1d matching the reference ``conv1d_forward`` semantics.

    Args:
      x: (B, D, L) if is_bhl else (B, L, D).
      weights: (D, K) if is_bhl else (K, D).
      bias: (D,) or None.
      padding: zero padding — an int (symmetric) or (left, right); output
        length L + left + right - K + 1. Causal convs use (K-1, 0), the
        semantics of the reference models' Conv1d(padding=K-1) + [..., :L]
        truncation (hyena.py:273-303).
      impl: 'auto' (Pallas when the shape qualifies), 'pallas', 'xla'
        (grouped lax.conv — the right choice under GSPMD sequence sharding,
        where XLA inserts the halo exchange; a pallas_call would force a
        full gather instead), or 'shifts' (K fused padded-slice
        multiply-adds, no conv op: the dense-layout choice at small batch
        where XLA's conv layouts pad 2x — see _xla_depthwise).
    """
    if is_bhl:
        d, k = weights.shape
        w_kd = weights.T  # (K, D)
        l = x.shape[-1]
    else:
        k, d = weights.shape
        w_kd = weights
        l = x.shape[-2]
    _check(weights, bias, k)
    if isinstance(padding, int):
        padding = (padding, padding)
    else:
        padding = (int(padding[0]), int(padding[1]))
    out_dtype = x.dtype

    if impl not in ("auto", "pallas", "xla", "shifts"):
        raise ValueError(f"unknown impl {impl!r}")
    if impl == "shifts":
        return _xla_depthwise(
            x, w_kd, bias, padding, is_bhl, out_dtype, use_conv=False
        )
    use_pallas = (
        impl != "xla" and x.ndim == 3 and _pallas_ok(x, d, l, padding, k, is_bhl)
    )
    if impl == "pallas" and not use_pallas:
        raise ValueError("shape does not qualify for the Pallas depthwise path")
    if impl == "auto" and use_pallas and not _pallas_profitable(d, l):
        use_pallas = False
    if use_pallas:
        return _dw_conv(x, w_kd, bias, padding, is_bhl, out_dtype, impl == "pallas")
    return _xla_depthwise(x, w_kd, bias, padding, is_bhl, out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _dw_conv(x, w_kd, bias, padding, is_bhl, out_dtype, force):
    return _pallas_depthwise(x, w_kd, bias, padding, is_bhl, out_dtype)


def _dw_fwd(x, w_kd, bias, padding, is_bhl, out_dtype, force):
    # Under differentiation the default mode runs the XLA forward too:
    # keeping the Pallas forward in the training graph forces relayout
    # copies on every XLA op behind it (see _bwd_mode). impl='pallas'
    # (force) pins the Pallas kernels regardless.
    if _bwd_mode() == "xla" and not force and x.ndim == 3:
        y = _xla_depthwise(x, w_kd, bias, padding, is_bhl, out_dtype)
    else:
        y = _pallas_depthwise(x, w_kd, bias, padding, is_bhl, out_dtype)
    return y, (x, w_kd, bias)


def _dw_bwd(padding, is_bhl, out_dtype, force, res, dout):
    """du via the same kernel with flipped weights (correlation); dk/dbias via
    XLA reductions — the {du, dk, dbias} triple of the reference's
    conv1d_backward (csrc/flashfftconv/conv1d/conv1d.h:76-96). Mode selection
    (xla floor / fused one-pass kernel / transposed-conv composite) is
    documented at _bwd_mode."""
    x, w_kd, bias = res
    k = w_kd.shape[0]
    pl_, pr_ = (padding, padding) if isinstance(padding, int) else padding
    l_bwd = x.shape[-1] if is_bhl else x.shape[-2]
    fused_ok = (
        pl_ + pr_ == k - 1
        and k <= 9
        and dout.shape == x.shape
        and (
            l_bwd <= _l_tile_bwd(is_bhl)
            or l_bwd % _l_tile_bwd(is_bhl) == 0
        )
    )
    mode = _bwd_mode()
    if force and mode == "xla":
        # impl='pallas' pins the Pallas kernel family end to end.
        mode = "fused"
    if mode == "fused" and fused_ok:
        du_f, dw_f, dbias_f = _pallas_depthwise_bwd(x, dout, w_kd, padding, is_bhl)
        dbias = None if bias is None else dbias_f.astype(bias.dtype)
        return du_f.astype(x.dtype), dw_f.astype(w_kd.dtype), dbias
    if x.ndim == 3:
        # du/dk via XLA's grouped-conv transposes (linear_transpose runs NO
        # forward recompute — the op is bilinear, primals suffice). Compute
        # dtype stays x.dtype (bf16): upcasting the strips to f32 doubles
        # HBM traffic; XLA's conv accumulates in f32 internally either way.
        cd = x.dtype
        dout_c = dout.astype(cd)
        du_t = jax.linear_transpose(
            lambda xx: _xla_depthwise(xx, w_kd, None, padding, is_bhl, cd),
            x,
        )
        (du,) = du_t(dout_c)
        dw_t = jax.linear_transpose(
            lambda ww: _xla_depthwise(x, ww, None, padding, is_bhl, cd),
            w_kd,
        )
        (dw,) = dw_t(dout_c)
        if bias is None:
            dbias = None
        else:
            sum_axes = (0, 2) if is_bhl else (0, 1)
            dbias = dout.astype(jnp.float32).sum(sum_axes).astype(bias.dtype)
        return du.astype(x.dtype), dw.astype(w_kd.dtype), dbias
    # Transposed conv: pad' = (k-1-pl, k-1-pr) gives du of length L.
    du = _pallas_depthwise(
        dout, jnp.flip(w_kd, axis=0), None, (k - 1 - pl_, k - 1 - pr_),
        is_bhl, jnp.float32,
    ).astype(x.dtype)

    axis = -1 if is_bhl else -2
    xp_pad = [(0, 0)] * x.ndim
    xp_pad[axis] = padding
    xf = jnp.pad(x.astype(jnp.float32), xp_pad)
    df = dout.astype(jnp.float32)
    l_out = dout.shape[axis]
    taps = []
    for tap in range(k):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(tap, tap + l_out)
        seg = xf[tuple(sl)]
        if is_bhl:
            taps.append(jnp.einsum("bdl,bdl->d", seg, df))
        else:
            taps.append(jnp.einsum("bld,bld->d", seg, df))
    dw = jnp.stack(taps, axis=0).astype(w_kd.dtype)  # (K, D)
    if bias is None:
        dbias = None
    else:
        sum_axes = (0, 2) if is_bhl else (0, 1)
        dbias = df.sum(sum_axes).astype(bias.dtype)
    return du, dw, dbias


_dw_conv.defvjp(_dw_fwd, _dw_bwd)
