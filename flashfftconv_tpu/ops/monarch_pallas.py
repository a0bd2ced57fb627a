"""Fused Pallas TPU kernels for the Monarch FFT convolution.

The TPU analog of the reference's fused CUDA kernels
(csrc/flashfftconv/monarch_cuda/kernels_fp16/monarch_cuda_kernel.h:15-390):
one kernel instance per (h, b) grid step computes the entire convolution for
one channel — forward DFT stage, twiddle, frequency-domain kernel multiply,
inverse DFT stages — on data resident in VMEM, as a chain of MXU matmuls
against the plan's DFT matrices.

Differences from the CUDA design (deliberate, TPU-native):
  - Factors are 16..256 (vs WMMA 16/32): the contraction dims saturate the
    128x128 MXU and the whole (N1, N2) tile sits in VMEM with zero padding
    waste (N2 = 128 lanes exactly for N >= 2048).
  - Complex math is planar f32 on the VPU; matmul operands are cast to the
    plan's compute dtype (bf16) with f32 accumulation
    (preferred_element_type) — strictly better numerics than the reference's
    fp16 shared-memory tables.
  - The grid iterates (h, b) with b minor so the per-channel kernel spectrum
    block is fetched once per h and reused across the batch (the analog of
    the reference's per-block k_f fragment reuse, monarch_cuda_kernel.h:216).
  - When B is even and H % 8 == 0 (the common case), the fused-I/O kernels
    read/write (B, H, L) directly: the (L,) -> (N1, N2) relayout, implicit
    zero-padding, truncation and both gate multiplies all happen in-kernel
    (in-VMEM relayout measures at the bandwidth floor), exactly one HBM
    round trip per conv — the analog of the reference's BlockLoad zero-fill
    + fused gates (monarch_cuda_kernel.h:258-390). Other shapes fall back to
    XLA layout passes around the tile kernels.

The public entry is :func:`fft_conv_pallas` (custom VJP; the backward reuses
the same kernel with a conjugated spectrum for du — circular correlation —
and recomputes spectra for dk, the reference's recompute-in-backward policy,
conv.py:587-588).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashfftconv_tpu.ops import monarch_xla
from flashfftconv_tpu.ops import plan as plan_mod
from flashfftconv_tpu.ops.plan import FftPlan

MAX_FUSED_SEQLEN = 32768

# Outer f0-point DFT formulation inside the fused long kernels: below this
# f0 the unrolled VPU multiply-adds win (bands*f0 <= ~15 full-tile passes);
# from f0 >= 8 the bands*f0 VPU passes dominate the whole kernel and the
# low-K MXU matmul formulation (_mxu_outer_*) takes over.
_MXU_OUTER_MIN_F0 = 8


def _fused3_vmem_mb(plan: FftPlan, packed: bool = True, gated: bool = True) -> float:
    """Upper-bound estimate of the fused long kernel's live VMEM (MB):
    pipeline-managed I/O blocks are double-buffered, xs/zs are f32 kernel
    temporaries, tables include the Karatsuba sums built in-kernel. packed
    doubles the I/O rows AND the outer bands (complex pair input defeats
    the rfft halving); gated adds the pre/post gate blocks."""
    f0, n1, n2 = plan.factors[-3:]
    t = n1 * n2
    rows = 2 if packed else 1
    bands = f0 if packed else f0 // 2 + 1
    io = 2  # bf16 HBM I/O
    blocks = 2 * f0 * t * io * rows * 2     # x + out, 2 buffers
    gates = blocks if gated else 0          # pre + post gate blocks
    kf = 2 * bands * t * io * 2             # planar spectrum, 2 buffers
    w0 = 2 * bands * t * 4                  # f32 outer twiddle (constant-index)
    xs = rows * f0 * t * 4                  # f32 chunk loads (complex if packed)
    zs = 2 * bands * t * 4                  # complex f32 band results
    tables = (4 * n1 * n1 + 4 * n2 * n2 + 2 * n1 * n2) * 4 * 1.5
    temps = 8 * t * 4                       # per-band matmul temporaries
    # fori band-loop VMEM scratch (spec f32 + band results at io dtype);
    # the backward's 4-spectra variant is ~2x this — the upper bound here
    # covers the forward, and the bwd-heavy shapes are what the budget
    # rejects first anyway.
    scratch = (2 * 4 + 2 * io) * bands * t if _fori_bands(f0, n1, bands) else 0
    return (blocks + gates + kf + w0 + xs + zs + tables + temps + scratch) / 2**20


def _fused2_vmem_mb(plan: FftPlan, gated: bool = True, ht: int | None = None) -> float:
    """Upper-bound estimate of the fused-I/O 2-factor kernel's live VMEM
    (MB). Probe/test-only at HEAD: the big-2-factor admission it used to
    gate was reverted after on-chip rejection (commit 9a2d1ba; the <=32K
    shapes all fit Mosaic's default cap and skip budget gating), so nothing
    in `supported()` calls this — kept for sweeps and the VMEM-budget tests.
    The fused-I/O path always packs two batch rows per grid step; the kf
    planes are blocked per h-tile; per-group chain temporaries are f32."""
    n1, n2 = plan.factors
    n = n1 * n2
    if ht is None:
        ht = _h_tile(n1, n2, 0) or _H_TILE  # h=0: generic cap, ht | h refines
    io = 2  # bf16 HBM I/O
    blocks = 2 * 2 * ht * n * io * 2        # x + out, 2 rows, 2 buffers
    gates = blocks if gated else 0          # pre + post gate blocks
    kf = 2 * ht * n * io * 2                # planar spectrum block, 2 buffers
    g = _group_size(n1)
    temps = 10 * g * n * 4                  # f32 chain temporaries per group
    tables = (4 * g * g * n1 * n1 + 4 * n2 * n2 + 2 * n1 * n2) * 4 * 1.5
    return (blocks + gates + kf + temps + tables) / 2**20


def _compiler_params():
    """Per-kernel Mosaic params: raise the scoped-VMEM cap to the configured
    budget (plan.VMEM_BUDGET_MB; Mosaic's default is ~16 MB while v5e-class
    chips physically carry far more — benchmarks/tpu_vmem_probe.py)."""
    return pltpu.CompilerParams(
        vmem_limit_bytes=max(plan_mod.vmem_budget_mb(), 16) * 2**20
    )


def supported(plan: FftPlan) -> bool:
    """Fused-kernel support: 2-factor plans (<=32K) run as a single fused
    kernel; 3-factor plans run the fused long kernel when the whole
    (f0, N1, N2) signal and its band spectra fit the VMEM budget; 4-factor
    plans run the three-stage pipeline — Pallas outer butterfly, fused
    complex inner conv, inverse butterfly (the analog of the reference's
    butterfly -> monarch_conv_*_complex -> butterfly_ifft chain,
    conv.py:692-1733)."""
    if len(plan.factors) == 1:
        # Direct-DFT fused kernel (explicit 1-factor plans; default plans are
        # 2-factor from 256 up). Measured faster than the XLA batched matmul
        # up to 1024 (1.84 vs 2.05 ms at B=16/H=768/N=1024 on v5e).
        return plan.seqlen <= 1024
    if len(plan.factors) == 2:
        # Big 2-factor plans past 32K (64K as one (256,256) fused-I/O
        # kernel etc.) were measured on-chip and REJECTED: their gated
        # forward compiles crash the remote compile helper at 64K/128K,
        # and the 256K (512,512) forward that did compile loses to the
        # fused 3-factor (5.8 vs 4.3 ms) with a backward that won't
        # compile (benchmarks/tpu_factor_sweep.json). The kernels remain
        # factor-generic (interpret-mode correct, _fused2_vmem_mb sizes
        # them) if a future toolchain lifts the compile-size wall.
        return 256 <= plan.seqlen <= MAX_FUSED_SEQLEN
    if len(plan.factors) == 3:
        f0, n1, n2 = plan.factors
        # Round-3 shapes (inner <= 32K, N <= 256K) fit Mosaic's default cap;
        # larger fused shapes are gated on the configured VMEM budget at the
        # unpacked+gated estimate (the mode the dispatch can always force —
        # _use_half drops to half-band unpacked when packing would not fit).
        if n1 * n2 <= MAX_FUSED_SEQLEN and f0 * n1 * n2 <= 8 * MAX_FUSED_SEQLEN:
            return True
        return (
            _fused3_vmem_mb(plan, packed=False, gated=True)
            <= plan_mod.vmem_budget_mb()
        )
    if len(plan.factors) == 4:
        f00, f0, n1, n2 = plan.factors
        if n1 * n2 <= MAX_FUSED_SEQLEN and f0 * n1 * n2 <= 8 * MAX_FUSED_SEQLEN:
            return True
        # Fatter pipelines (e.g. 4M as butterfly(8) + 512K complex inner):
        # the inner fused kernel runs complex-I/O ungated — the same live
        # set as the packed/ungated mode of the 3-factor estimator
        # (complex pair == packed rows; gates ride the butterflies).
        return (
            max(n1, n2) <= 512
            and _fused3_vmem_mb(plan, packed=True, gated=False)
            <= plan_mod.vmem_budget_mb()
        )
    return False


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _conv_kernel(
    u_re_ref,
    u_im_ref,  # None when real input
    kf_re_ref,
    kf_im_ref,
    f1re_ref,
    f1im_ref,
    w1re_ref,
    w1im_ref,
    f2re_ref,
    f2im_ref,
    if2re_ref,
    if2im_ref,
    if1re_ref,
    if1im_ref,
    o_re_ref,
    o_im_ref,  # None when real output
    *,
    compute_dtype,
    packed=False,
):
    """One (b, h) step: conv of a single (N1, N2) tile, fully in VMEM.

    packed=True: u_re_ref/o_re_ref hold (2, 1, N1, N2) blocks — two real
    signals convolved as one complex signal (real kernel)."""

    def mm(a, b):
        return jnp.dot(
            a.astype(compute_dtype),
            b.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )

    def cmm_left(mre, mim, xre, xim):
        # (f, f) complex matrix times (f, R) complex tile from the left,
        # via 3 real matmuls (Karatsuba) — 25% fewer MXU FLOPs than the
        # 4-matmul form; the table sum is a per-step VPU add.
        if xim is None:
            return mm(mre, xre), mm(mim, xre)
        t1, t2 = mm(mre, xre), mm(mim, xim)
        t3 = mm(mre + mim, xre + xim)
        return t1 - t2, t3 - t1 - t2

    def cmm_right(xre, xim, mre, mim):
        # (N1, f) complex tile times (f, f) complex matrix from the right.
        t1, t2 = mm(xre, mre), mm(xim, mim)
        t3 = mm(xre + xim, mre + mim)
        return t1 - t2, t3 - t1 - t2

    def cmul(are, aim, bre, bim):
        return are * bre - aim * bim, are * bim + aim * bre

    if packed:
        xre = u_re_ref[0, 0]
        xim = u_re_ref[1, 0]
    else:
        xre = u_re_ref[0, 0]
        xim = None if u_im_ref is None else u_im_ref[0, 0]

    # Stage 1: DFT along n1 (rows), then twiddle.
    xre, xim = cmm_left(f1re_ref[...], f1im_ref[...], xre, xim)
    xre, xim = cmul(xre, xim, w1re_ref[...], w1im_ref[...])
    # Stage 2: DFT along n2 (columns; F2 is symmetric so right-multiply works).
    xre, xim = cmm_right(xre, xim, f2re_ref[...], f2im_ref[...])
    # Frequency-domain depthwise multiply with this channel's spectrum.
    xre, xim = cmul(xre, xim, kf_re_ref[0], kf_im_ref[0])
    # Inverse stage 2, conjugate twiddle, inverse stage 1 (carries 1/N).
    xre, xim = cmm_right(xre, xim, if2re_ref[...], if2im_ref[...])
    xre, xim = cmul(xre, xim, w1re_ref[...], -w1im_ref[...])
    if packed:
        re, im = cmm_left(if1re_ref[...], if1im_ref[...], xre, xim)
        o_re_ref[0, 0] = re.astype(o_re_ref.dtype)
        o_re_ref[1, 0] = im.astype(o_re_ref.dtype)
    elif o_im_ref is None:
        re = mm(if1re_ref[...], xre) - mm(if1im_ref[...], xim)
        o_re_ref[0, 0] = re.astype(o_re_ref.dtype)
    else:
        re, im = cmm_left(if1re_ref[...], if1im_ref[...], xre, xim)
        o_re_ref[0, 0] = re.astype(o_re_ref.dtype)
        o_im_ref[0, 0] = im.astype(o_im_ref.dtype)


_H_TILE = 8  # minimum channels per grid step in the fused-I/O kernels
# Per-grid-step unroll budget for the fused-I/O kernels: (ht/g) iterations
# x n1 rows each; see the compile-cost cap in _h_tile.
_UNROLL_ROWS = 2048

# The fused long kernels unroll their band loop in Python; past this many
# unroll-rows (bands * n1) Mosaic compile time explodes and eventually the
# remote compile helper dies (measured: 2M 3-factor forwards took 270-515 s
# to compile and every 2M/4M 3-factor BACKWARD crashed the helper,
# tpu_factor_sweep.json). Above the threshold the mxu-outer band loop runs
# as an in-kernel lax.fori_loop over VMEM scratch instead: compile cost
# becomes O(1) in bands. Defaults leave the hardware-verified <=1M unrolled
# plans untouched ((8,512,256) = 2560 rows); override for A/B.
_BAND_FORI_ROWS = int(os.environ.get("FLASHFFTCONV_BAND_FORI_ROWS", "4096"))


def _fori_bands(f0: int, n1: int, bands: int) -> bool:
    """True when the band loop should run as lax.fori_loop (see above)."""
    return f0 >= _MXU_OUTER_MIN_F0 and bands * n1 >= _BAND_FORI_ROWS


# Largest N whose GATE-FUSED fused-3-factor backward fits physical VMEM
# (see _long_bwd_fused); bigger plans apply gates as XLA passes.
_GATED_BWD_MAX = int(os.environ.get("FLASHFFTCONV_GATED_BWD_MAX", str(1 << 20)))

# Natural-I/O variants (in-kernel (L,) <-> Monarch relayout instead of an
# XLA reshape) were built, measured, and REMOVED: see docs/DESIGN.md
# "Measured alternatives" for the numbers (VPU lane->sublane shuffles lose
# to XLA's bandwidth-efficient relayout copies at >=64K; the whole-channel
# butterfly variant exceeds Mosaic's 16 MB scoped-VMEM accounting). The
# code is in git history (grep _NAT_BUTTERFLY_MAX).


def _group_size(n1: int) -> int:
    """Channels convolved per stage-1 matmul: g = 128 // n1 (>= 1). For small
    n1 the stage-1 contraction alone (K = n1, as low as 2) would waste the
    128-deep MXU; instead g channels are merged into one (g*n1, n2) tile and
    multiplied by a block-diagonal DFT matrix diag(F1 x g), giving every
    matmul full contraction depth. Leading-dim merges are free in VMEM, so
    there is no relayout cost."""
    return max(1, 128 // n1)


def _h_tile(n1: int, n2: int, h: int) -> int | None:
    """Channels per grid step: a multiple of the group size, capped so the
    per-step VMEM working set (~6 bf16/f32 buffers of ht*N) stays a few MB.
    None if h doesn't tile into any valid ht."""
    g = _group_size(n1)
    n = n1 * n2
    # Budget ~1 MB per double-buffered I/O block (2 packed rows x ht x N
    # bf16): ht = 2^18/N. The old min(64, ...) clamp made N <= 2K blocks
    # tiny (64 KB at N=256) so per-grid-step dispatch/DMA latency dominated
    # the small-N kernels; the clamp now only guards the degenerate N < 256.
    # A raised VMEM budget could scale the per-block allotment, but the
    # <=32K tiles are pinned at scale 1: those shapes are the hardware-
    # verified record (tpu_parity.json, results_v5e_r4_mid.csv), MFU there
    # is already 0.46-0.59, and bigger unrolls risk the compile-helper
    # blowup below without measured gain.
    cap = max(g, _H_TILE, min(1024, (1 << 18) // n))
    # Mosaic compile cost scales with the per-step unroll: ht/g chain
    # iterations x n1 sublane rows each. Past ~2048 unroll-rows the remote
    # compile helper dies (measured: (256,256) at ht=16 = 4096 rows crashes
    # after ~160 s; 2048 rows compiles in 30-45 s), so cap the product.
    cap = min(cap, max(g, g * (_UNROLL_ROWS // n1)))
    ht = cap - (cap % g)
    while ht >= g:
        if h % ht == 0:
            return ht
        ht -= g
    return None


def _block_diag(mre, mim, g: int):
    """(f, f) planar complex matrix -> (g*f, g*f) block-diagonal planar."""
    if g == 1:
        return mre, mim
    f = mre.shape[0]
    eye = jnp.eye(g, dtype=mre.dtype)
    bd = lambda m: jnp.einsum("ab,ij->aibj", eye, m).reshape(g * f, g * f)
    return bd(mre), bd(mim)


@functools.partial(
    jax.jit,
    static_argnames=("plan_factors", "seqlen", "compute_dtype", "gated", "ht"),
)
def _conv_fused_io_tiles(
    u, kf_re, kf_im, pregate, postgate, tables,
    plan_factors, seqlen, compute_dtype, gated, ht,
):
    """Fully-fused 2-factor forward: reads u (B, H, L) directly, does the
    (L,) -> (N1, N2) relayout, zero-padding, gating, and the packed complex
    conv chain all inside the kernel, and writes (B, H, L) back. One HBM
    round trip total — the exact analog of the reference's fused kernel
    with BlockLoad zero-fill + in/out-gate multiplies
    (kernels_fp16/monarch_cuda_kernel.h:258-390).

    Channels are processed in groups of g = 128//n1 per matmul (block-diag
    stage-1, see _group_size), so every MXU op has >= 128 contraction depth
    at every size 256..32K. Requires even B and h % ht == 0 with ht a
    multiple of g (dispatch falls back otherwise)."""
    b, h, length = u.shape
    n1, n2 = plan_factors
    n = seqlen
    g = _group_size(n1)
    assert ht % g == 0 and h % ht == 0
    grid = (h // ht, b // 2)

    io_spec = pl.BlockSpec(
        (2, ht, length), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
    )
    kf_spec = pl.BlockSpec((ht, n1, n2), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    small = pl.BlockSpec(memory_space=pltpu.VMEM)

    f1r, f1i, w1r, w1i, f2r, f2i, if2r, if2i, if1r, if1i = tables
    f1r, f1i = _block_diag(f1r, f1i, g)
    if1r, if1i = _block_diag(if1r, if1i, g)

    in_specs = [io_spec, kf_spec, kf_spec] + [small] * 10
    inputs = [u, kf_re, kf_im, f1r, f1i, w1r, w1i, f2r, f2i, if2r, if2i, if1r, if1i]
    if gated:
        in_specs += [io_spec, io_spec]
        inputs += [pregate, postgate]

    def kernel(*refs):
        u_ref, kfr, kfi = refs[0], refs[1], refs[2]
        (f1r, f1i, w1r, w1i, f2r, f2i, if2r, if2i, if1r, if1i) = refs[3:13]
        if gated:
            pre_ref, post_ref, o_ref = refs[13], refs[14], refs[15]
        else:
            o_ref = refs[13]
            pre_ref = post_ref = None

        def mm(a, bb):
            return jnp.dot(
                a.astype(compute_dtype), bb.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )

        def cmul(are, aim, bre, bim):
            return are * bre - aim * bim, are * bim + aim * bre

        f1r_m, f1i_m = f1r[...], f1i[...]
        w1r_m = w1r[...][None]  # (1, n1, n2), broadcasts over the group
        w1i_m = w1i[...][None]
        f2r_m, f2i_m = f2r[...], f2i[...]
        if2r_m, if2i_m = if2r[...], if2i[...]
        if1r_m, if1i_m = if1r[...], if1i[...]
        # Karatsuba sum tables (3-matmul complex products, hoisted VPU adds)
        f1s_m = f1r_m + f1i_m
        f2s_m = f2r_m + f2i_m
        if2s_m = if2r_m + if2i_m
        if1s_m = if1r_m + if1i_m

        rows = length // n2

        def to_tiles(v):
            # (g, rows, n2) -> zero-pad rows to n1. f32, 3D pad on the
            # sublane axis (1D lane pads lower to unsupported concats).
            v = v.astype(jnp.float32).reshape(g, rows, n2)
            if rows < n1:
                v = jnp.pad(v, ((0, 0), (0, n1 - rows), (0, 0)))
            return v

        def m2(x3):  # (g, n1, n2) -> (g*n1, n2), free merge
            return x3.reshape(g * n1, n2)

        def m3(x2):  # inverse
            return x2.reshape(g, n1, n2)

        for grp in range(ht // g):
            sl = slice(grp * g, (grp + 1) * g)
            a = u_ref[0, sl]
            bb = u_ref[1, sl]
            if pre_ref is not None:
                a = a * pre_ref[0, sl]
                bb = bb * pre_ref[1, sl]
            xre = to_tiles(a)
            xim = to_tiles(bb)

            # stage 1: block-diag DFT along n1 for all g channels at once
            t1, t2 = mm(f1r_m, m2(xre)), mm(f1i_m, m2(xim))
            t3 = mm(f1s_m, m2(xre) + m2(xim))
            xre, xim = cmul(m3(t1 - t2), m3(t3 - t1 - t2), w1r_m, w1i_m)
            # stage 2: DFT along n2 (shared across channels)
            t1, t2 = mm(m2(xre), f2r_m), mm(m2(xim), f2i_m)
            t3 = mm(m2(xre) + m2(xim), f2s_m)
            xre, xim = cmul(m3(t1 - t2), m3(t3 - t1 - t2), kfr[sl], kfi[sl])
            t1, t2 = mm(m2(xre), if2r_m), mm(m2(xim), if2i_m)
            t3 = mm(m2(xre) + m2(xim), if2s_m)
            xre, xim = cmul(m3(t1 - t2), m3(t3 - t1 - t2), w1r_m, -w1i_m)
            t1, t2 = mm(if1r_m, m2(xre)), mm(if1i_m, m2(xim))
            t3 = mm(if1s_m, m2(xre) + m2(xim))
            rre = m3(t1 - t2)
            rim = m3(t3 - t1 - t2)

            r0 = rre[:, :rows].reshape(g, length)
            r1 = rim[:, :rows].reshape(g, length)
            if post_ref is not None:
                r0 = r0 * post_ref[0, sl].astype(jnp.float32)
                r1 = r1 * post_ref[1, sl].astype(jnp.float32)
            o_ref[0, sl] = r0.astype(o_ref.dtype)
            o_ref[1, sl] = r1.astype(o_ref.dtype)

    flops_per_pair = 2 * (8 * n1 * n1 * n2 + 8 * n1 * n2 * n2)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=io_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, length), u.dtype),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pair * (b // 2) * h,
            bytes_accessed=b * h * length * (8 if gated else 4),
            transcendentals=0,
        ),
    )(*inputs)


@functools.partial(
    jax.jit, static_argnames=("seqlen", "compute_dtype", "gated", "ht")
)
def _direct_fused_io_tiles(
    u, kf_re, kf_im, pregate, postgate, cre, cim, icre, icim,
    seqlen, compute_dtype, gated, ht,
):
    """Fused direct-DFT conv for small N (<= 1024): per grid step, 16 real
    signals (2 batch rows x 8 channels) form a (16, N) matrix and the whole
    conv is four (16, N) @ (N, N) MXU matmuls + the per-channel spectrum
    multiply — full-contraction matmuls beat the Monarch split at small N
    (see plan.DIRECT_MAX). One HBM round trip, gates fused. Requires even B,
    H % 8 == 0. L < N (the padded conv) is handled by the CALLER slicing the
    DFT tables instead of zero-padding the signal: x_pad @ C == x @ C[:L]
    and y_full[..., :L] == y @ IC[:, :L], so cre/cim arrive as (L, N) and
    icre/icim as (N, L) and the kernel never materializes the pad."""
    b, h, length = u.shape
    n = seqlen
    assert cre.shape == (length, n) and icre.shape == (n, length)
    assert h % ht == 0
    grid = (h // ht, b // 2)

    io_spec = pl.BlockSpec(
        (2, ht, length), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
    )
    kf_spec = pl.BlockSpec((ht, n), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    small = pl.BlockSpec(memory_space=pltpu.VMEM)

    in_specs = [io_spec, kf_spec, kf_spec] + [small] * 4
    inputs = [u, kf_re, kf_im, cre, cim, icre, icim]
    if gated:
        in_specs += [io_spec, io_spec]
        inputs += [pregate, postgate]

    def kernel(*refs):
        u_ref, kfr_ref, kfi_ref, cre_ref, cim_ref, icre_ref, icim_ref = refs[:7]
        if gated:
            pre_ref, post_ref, o_ref = refs[7], refs[8], refs[9]
        else:
            o_ref = refs[7]
            pre_ref = post_ref = None

        def mm(a, bb):
            return jnp.dot(
                a.astype(compute_dtype), bb.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )

        x = u_ref[...]
        if pre_ref is not None:
            x = x * pre_ref[...]
        x = x.reshape(2 * ht, length)
        zre = mm(x, cre_ref[...])
        zim = mm(x, cim_ref[...])
        # per-channel spectrum, repeated for the two batch rows
        kfr = jnp.broadcast_to(kfr_ref[...][None], (2, ht, n)).reshape(2 * ht, n)
        kfi = jnp.broadcast_to(kfi_ref[...][None], (2, ht, n)).reshape(2 * ht, n)
        yre = zre * kfr - zim * kfi
        yim = zre * kfi + zim * kfr
        out = (
            mm(yre, icre_ref[...]) - mm(yim, icim_ref[...])
        ).reshape(2, ht, length)
        if post_ref is not None:
            out = out * post_ref[...].astype(jnp.float32)
        o_ref[...] = out.astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=io_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, length), u.dtype),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * length * n * 2,
            bytes_accessed=b * h * length * (8 if gated else 4),
            transcendentals=0,
        ),
    )(*inputs)


@functools.partial(
    jax.jit, static_argnames=("plan_factors", "compute_dtype", "out_dtype")
)
def _spectrum_tiles(
    k4, f1re, f1im, w1re, w1im, f2re, f2im, plan_factors, compute_dtype,
    out_dtype=jnp.float32,
):
    """Kernel-spectrum Pallas kernel for 2-factor plans: real (H, N1, N2)
    kernel taps -> planar Monarch-layout spectrum, emitted at out_dtype (the
    conv kernels read k_f at compute dtype, so emitting bf16 here halves the
    spectrum write + downstream read with no extra cast pass). One channel
    group (g = 128//n1, block-diag stage-1) per grid step; the pass is
    output-bandwidth-bound."""
    h, n1, n2 = k4.shape
    assert plan_factors == (n1, n2)
    g = _group_size(n1)
    if h % g:
        g = 1
    grid = (h // g,)
    tile = pl.BlockSpec((g, n1, n2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    small = pl.BlockSpec(memory_space=pltpu.VMEM)
    f1re, f1im = _block_diag(f1re, f1im, g)

    def kernel(k_ref, f1r, f1i, w1r, w1i, f2r, f2i, or_ref, oi_ref):
        def mm(a, b):
            return jnp.dot(
                a.astype(compute_dtype), b.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )

        x = k_ref[...].reshape(g * n1, n2)
        xre, xim = mm(f1r[...], x), mm(f1i[...], x)
        xre = xre.reshape(g, n1, n2)
        xim = xim.reshape(g, n1, n2)
        w1r_m = w1r[...][None]
        w1i_m = w1i[...][None]
        xre, xim = (
            xre * w1r_m - xim * w1i_m,
            xre * w1i_m + xim * w1r_m,
        )
        xre = xre.reshape(g * n1, n2)
        xim = xim.reshape(g * n1, n2)
        t1, t2 = mm(xre, f2r[...]), mm(xim, f2i[...])
        t3 = mm(xre + xim, f2r[...] + f2i[...])  # Karatsuba
        or_ref[...] = (t1 - t2).reshape(g, n1, n2).astype(or_ref.dtype)
        oi_ref[...] = (t3 - t1 - t2).reshape(g, n1, n2).astype(oi_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tile] + [small] * 6,
        out_specs=[tile, tile],
        out_shape=[jax.ShapeDtypeStruct((h, n1, n2), out_dtype)] * 2,
        interpret=_interpret(),
    )(k4, f1re, f1im, w1re, w1im, f2re, f2im)


@functools.partial(
    jax.jit,
    static_argnames=("factors", "compute_dtype", "out_dtype", "complex_in"),
)
def _fwd_dft_tiles(
    x_re, x_im, c0_re, c0_im, w0_re, w0_im, tables5,
    factors, compute_dtype, out_dtype, complex_in,
):
    """Fused 3-stage forward Monarch DFT over (C, f0, n1, n2) tiles: outer
    f0-point DFT across chunks + outer twiddle + per-chunk (n1, n2) 2-way DFT,
    one channel per grid step, emitting the planar spectrum at out_dtype.

    Used for the >=64K kernel-spectrum computation (k -> k_f): the XLA einsum
    path materializes full planar f32 intermediates per stage in HBM, which
    measured 9.7 ms at N=262144/H=192 on v5e — ~70% of the whole conv call.
    This kernel is one HBM round trip. (The reference pays cuFFT for the same
    step, conv.py:573-575.)
    """
    f0, n1, n2 = factors
    c, f0_, n1_, n2_ = x_re.shape
    assert factors == (f0_, n1_, n2_)
    tile = pl.BlockSpec(
        (1, f0, n1, n2), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    # Bands emitted = rows of the outer DFT table (f0, or f0//2+1 when the
    # caller passes half-band rfft tables for real input).
    bands = c0_re.shape[0]
    grid = (c,)
    btile = pl.BlockSpec(
        (1, bands, n1, n2), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    w0_spec = pl.BlockSpec(
        (1, bands, n1, n2), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    small = pl.BlockSpec(memory_space=pltpu.VMEM)
    f1r_t, f1i_t, w1r_t, w1i_t, f2r_t, f2i_t = tables5

    in_specs = [tile] + ([tile] if complex_in else [])
    inputs = [x_re] + ([x_im] if complex_in else [])
    in_specs += [small, small, w0_spec, w0_spec] + [small] * 6
    inputs += [c0_re, c0_im, w0_re[None], w0_im[None], f1r_t, f1i_t, w1r_t, w1i_t, f2r_t, f2i_t]

    def kernel(*refs):
        i = 0
        xr_ref = refs[i]; i += 1
        xi_ref = None
        if complex_in:
            xi_ref = refs[i]; i += 1
        c0r, c0i, w0r, w0i = refs[i : i + 4]; i += 4
        f1r, f1i, w1r, w1i, f2r, f2i = refs[i : i + 6]; i += 6
        or_ref, oi_ref = refs[i], refs[i + 1]

        def mm(a, b):
            return jnp.dot(
                a.astype(compute_dtype), b.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )

        def cmul(are, aim, bre, bim):
            return are * bre - aim * bim, are * bim + aim * bre

        f1r_m, f1i_m = f1r[...], f1i[...]
        w1r_m, w1i_m = w1r[...], w1i[...]
        f2r_m, f2i_m = f2r[...], f2i[...]
        f1s_m = f1r_m + f1i_m  # Karatsuba sum tables
        f2s_m = f2r_m + f2i_m

        mxu_outer = f0 >= _MXU_OUTER_MIN_F0
        xs = spec = None
        if mxu_outer:
            t = n1 * n2
            fr = xr_ref[0].astype(jnp.float32).reshape(f0, t)
            fi = (
                xi_ref[0].astype(jnp.float32).reshape(f0, t)
                if complex_in else None
            )
            sr, si = _mxu_outer_fwd(mm, c0r[...], c0i[...], fr, fi)
            spec = (sr.reshape(bands, n1, n2), si.reshape(bands, n1, n2))
        elif complex_in:
            xs = [
                (xr_ref[0, cc].astype(jnp.float32), xi_ref[0, cc].astype(jnp.float32))
                for cc in range(f0)
            ]
        else:
            xs = [(xr_ref[0, cc].astype(jnp.float32), None) for cc in range(f0)]

        for k0 in range(bands):
            if mxu_outer:
                acc_re, acc_im = spec[0][k0], spec[1][k0]
            else:
                acc_re = acc_im = None
                for cc in range(f0):
                    cr = c0r[k0, cc]
                    ci = c0i[k0, cc]
                    xr, xi = xs[cc]
                    tr = xr * cr if xi is None else xr * cr - xi * ci
                    ti = xr * ci if xi is None else xr * ci + xi * cr
                    acc_re = tr if acc_re is None else acc_re + tr
                    acc_im = ti if acc_im is None else acc_im + ti
            xre, xim = cmul(acc_re, acc_im, w0r[0, k0], w0i[0, k0])
            t1, t2 = mm(f1r_m, xre), mm(f1i_m, xim)
            t3 = mm(f1s_m, xre + xim)
            xre, xim = cmul(t1 - t2, t3 - t1 - t2, w1r_m, w1i_m)
            t1, t2 = mm(xre, f2r_m), mm(xim, f2i_m)
            t3 = mm(xre + xim, f2s_m)
            or_ref[0, k0] = (t1 - t2).astype(or_ref.dtype)
            oi_ref[0, k0] = (t3 - t1 - t2).astype(oi_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[btile, btile],
        out_shape=[jax.ShapeDtypeStruct((c, bands, n1, n2), out_dtype)] * 2,
        interpret=_interpret(),
        compiler_params=None if _interpret() else _compiler_params(),
        cost_estimate=pl.CostEstimate(
            flops=c * bands * (8 * f0 * n1 * n2 + 8 * n1 * n1 * n2 + 8 * n1 * n2 * n2),
            bytes_accessed=c * (f0 + bands) * n1 * n2 * 4,
            transcendentals=0,
        ),
    )(*inputs)


@functools.partial(
    jax.jit,
    static_argnames=("factors", "compute_dtype", "out_dtype", "real_out"),
)
def _inv_dft_tiles(
    x_re, x_im, ic0_re, ic0_im, w0_re, w0_im, tables5,
    factors, compute_dtype, out_dtype, real_out,
):
    """Inverse of _fwd_dft_tiles: (C, f0, n1, n2) planar Monarch-layout
    spectrum -> natural-chunk-layout signal, one channel per grid step.
    Chain per chunk: inverse inner stages (if2, conj w1, if1), conjugate
    outer twiddle, then the inverse outer f0-point DFT across chunks
    (ic0 carries the 1/N scale when base == 0). real_out drops the
    imaginary output (dk of a real kernel, final stage of a real iFFT).

    Used by the >=64K backward for dk = iFFT(dk_f) — the XLA einsum
    inverse (monarch_xla.monarch_idft) materializes full planar f32
    intermediates per stage in HBM, just like the forward case this
    mirrors. (The reference pays an fp32 torch.fft.ifft for the same
    step, conv.py:1758-1761.)"""
    c, bands, n1, n2 = x_re.shape
    f0 = factors[0]
    assert factors[1:] == (n1, n2) and ic0_re.shape == (f0, bands)
    grid = (c,)
    tile = pl.BlockSpec((1, f0, n1, n2), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    btile = pl.BlockSpec(
        (1, bands, n1, n2), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    w0_spec = pl.BlockSpec(
        (1, bands, n1, n2), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    small = pl.BlockSpec(memory_space=pltpu.VMEM)
    if1r_t, if1i_t, w1r_t, w1i_t, if2r_t, if2i_t = tables5

    in_specs = [btile, btile]
    in_specs += [small, small, w0_spec, w0_spec] + [small] * 6
    inputs = [x_re, x_im, ic0_re, ic0_im, w0_re[None], w0_im[None],
              if1r_t, if1i_t, w1r_t, w1i_t, if2r_t, if2i_t]

    def kernel(*refs):
        xr_ref, xi_ref = refs[0], refs[1]
        ic0r, ic0i, w0r, w0i = refs[2:6]
        if1r, if1i, w1r, w1i, if2r, if2i = refs[6:12]
        or_ref = refs[12]
        oi_ref = refs[13] if not real_out else None

        def mm(a, b):
            return jnp.dot(
                a.astype(compute_dtype), b.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )

        def cmul(are, aim, bre, bim):
            return are * bre - aim * bim, are * bim + aim * bre

        if1r_m, if1i_m = if1r[...], if1i[...]
        w1r_m, w1i_m = w1r[...], w1i[...]
        if2r_m, if2i_m = if2r[...], if2i[...]
        if1s_m = if1r_m + if1i_m  # Karatsuba sum tables
        if2s_m = if2r_m + if2i_m

        zs = []
        for k0 in range(bands):
            xre = xr_ref[0, k0].astype(jnp.float32)
            xim = xi_ref[0, k0].astype(jnp.float32)
            t1, t2 = mm(xre, if2r_m), mm(xim, if2i_m)
            t3 = mm(xre + xim, if2s_m)
            rr, ri = cmul(t1 - t2, t3 - t1 - t2, w1r_m, -w1i_m)
            t1, t2 = mm(if1r_m, rr), mm(if1i_m, ri)
            t3 = mm(if1s_m, rr + ri)
            zs.append(cmul(t1 - t2, t3 - t1 - t2, w0r[0, k0], -w0i[0, k0]))

        # (with half-band weighted ic0 the real-part sum over `bands`
        # reconstructs all f0 chunks of the real output)
        if f0 >= _MXU_OUTER_MIN_F0:
            t = n1 * n2
            zr = jnp.stack([z[0] for z in zs]).reshape(bands, t)
            zi = jnp.stack([z[1] for z in zs]).reshape(bands, t)
            o_re, o_im = _mxu_outer_inv(mm, ic0r[...], ic0i[...], zr, zi,
                                        want_imag=not real_out)
            or_ref[0] = o_re.reshape(f0, n1, n2).astype(or_ref.dtype)
            if not real_out:
                oi_ref[0] = o_im.reshape(f0, n1, n2).astype(oi_ref.dtype)
            return
        for cc in range(f0):
            acc_re = acc_im = None
            for k0 in range(bands):
                cr = ic0r[cc, k0]
                ci = ic0i[cc, k0]
                zr, zi = zs[k0]
                tr = zr * cr - zi * ci
                acc_re = tr if acc_re is None else acc_re + tr
                if not real_out:
                    ti = zr * ci + zi * cr
                    acc_im = ti if acc_im is None else acc_im + ti
            or_ref[0, cc] = acc_re.astype(or_ref.dtype)
            if not real_out:
                oi_ref[0, cc] = acc_im.astype(oi_ref.dtype)

    out_shape = [jax.ShapeDtypeStruct((c, f0, n1, n2), out_dtype)]
    out_specs = [tile]
    if not real_out:
        out_shape.append(jax.ShapeDtypeStruct((c, f0, n1, n2), out_dtype))
        out_specs.append(tile)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if not real_out else out_specs[0],
        out_shape=out_shape if not real_out else out_shape[0],
        interpret=_interpret(),
        compiler_params=None if _interpret() else _compiler_params(),
        cost_estimate=pl.CostEstimate(
            flops=c * bands * (8 * f0 * n1 * n2 + 6 * n1 * n1 * n2 + 6 * n1 * n2 * n2),
            bytes_accessed=c * n1 * n2 * (8 * bands + f0 * (4 if real_out else 8)),
            transcendentals=0,
        ),
    )(*inputs)
    if real_out:
        return outs, None
    return outs[0], outs[1]


def _inv_spectrum_tables(plan: FftPlan, base: int, half: bool = False):
    """(ic0, conj-able w0, inverse-inner-DFT) table bundle for _inv_dft_tiles
    at stages (base, base+1, base+2). half=True slices the band axis to
    f0//2+1 and weights ic0 columns for the real-output reconstruction."""
    f0 = plan.factors[base]
    n1, n2 = plan.factors[base + 1], plan.factors[base + 2]
    fh = _half_bands(f0) if half else f0
    ic0r, ic0i = plan.idft_re[base], plan.idft_im[base]
    if half:
        wts = jnp.asarray(_half_weights(f0))
        ic0r = ic0r[:, :fh] * wts
        ic0i = ic0i[:, :fh] * wts
    return (
        ic0r, ic0i,
        plan.tw_re[base].reshape(f0, n1, n2)[:fh],
        plan.tw_im[base].reshape(f0, n1, n2)[:fh],
        (
            plan.idft_re[base + 1], plan.idft_im[base + 1],
            plan.tw_re[base + 1], plan.tw_im[base + 1],
            plan.idft_re[base + 2], plan.idft_im[base + 2],
        ),
    )


def _spectrum_tables(plan: FftPlan, base: int, half: bool = False):
    """(c0, w0, inner-DFT) table bundle for _fwd_dft_tiles at stages
    (base, base+1, base+2). half=True slices the outer-band axis to
    f0//2+1 (real-input rfft symmetry)."""
    f0 = plan.factors[base]
    n1, n2 = plan.factors[base + 1], plan.factors[base + 2]
    fh = _half_bands(f0) if half else f0
    return (
        plan.dft_re[base][:fh], plan.dft_im[base][:fh],
        plan.tw_re[base].reshape(f0, n1, n2)[:fh],
        plan.tw_im[base].reshape(f0, n1, n2)[:fh],
        (
            plan.dft_re[base + 1], plan.dft_im[base + 1],
            plan.tw_re[base + 1], plan.tw_im[base + 1],
            plan.dft_re[base + 2], plan.dft_im[base + 2],
        ),
    )


def _forward_long_dft(plan: FftPlan, x2: jax.Array, half: bool = False):
    """Fused-Pallas forward Monarch DFT of real (C, N) input for long
    (3/4-factor) plans, emitting the planar Monarch-layout spectrum at the
    plan compute dtype: (C, f0, n1, n2) or (C, f00, f0, n1, n2). Input may
    be shorter than N (implicit zero-pad). half=True emits only the lower
    f//2+1 bands of the outermost factor (rfft symmetry, _half_bands)."""
    n = plan.seqlen
    h = x2.shape[0]
    out_dtype = plan.compute_dtype_name
    if len(plan.factors) == 3:
        f0, n1, n2 = plan.factors
        c0r, c0i, w0r, w0i, tables5 = _spectrum_tables(plan, 0, half=half)
        if x2.shape[-1] < n:
            x2 = jnp.pad(x2, ((0, 0), (0, n - x2.shape[-1])))
        return _fwd_dft_tiles(
            x2.reshape(h, f0, n1, n2), None, c0r, c0i, w0r, w0i, tables5,
            factors=plan.factors, compute_dtype=plan.compute_dtype_name,
            out_dtype=out_dtype, complex_in=False,
        )
    f00, f0, n1, n2 = plan.factors
    fb = _half_bands(f00) if half else f00
    r = n // f00
    rt = r // 128
    io = jnp.bfloat16 if plan.compute_dtype != jnp.float32 else jnp.float32
    if x2.shape[-1] < n:
        x2 = jnp.pad(x2, ((0, 0), (0, n - x2.shape[-1])))
    bre, bim = _butterfly_tiles(
        x2.reshape(1, h, f00, rt, 128), None,
        plan.dft_re[0][:fb], plan.dft_im[0][:fb],
        plan.tw_re[0].reshape(f00, rt, 128)[:fb],
        plan.tw_im[0].reshape(f00, rt, 128)[:fb],
        compute_dtype=plan.compute_dtype,
        io_dtype=io,
        packed=False,
        inverse=False,
    )
    c0r, c0i, w0r, w0i, tables5 = _spectrum_tables(plan, 1)
    kfr, kfi = _fwd_dft_tiles(
        bre.reshape(h * fb, f0, n1, n2),
        bim.reshape(h * fb, f0, n1, n2),
        c0r, c0i, w0r, w0i, tables5,
        factors=plan.factors[1:], compute_dtype=plan.compute_dtype_name,
        out_dtype=out_dtype, complex_in=True,
    )
    return (
        kfr.reshape(h, fb, f0, n1, n2),
        kfi.reshape(h, fb, f0, n1, n2),
    )


def _inverse_long_dft(plan: FftPlan, xre: jax.Array, xim: jax.Array, half: bool = False):
    """Fused-Pallas inverse Monarch DFT for long (3/4-factor) plans:
    planar Monarch-layout spectrum (C, [f00,] f0, n1, n2) -> real (C, N)
    signal (imaginary part dropped — real-signal inverse, as for dk).
    half=True: the input holds only the lower f//2+1 bands of the
    outermost factor; the weighted inverse reconstructs the full real
    signal from them (rfft symmetry)."""
    n = plan.seqlen
    h = xre.shape[0]
    io = jnp.bfloat16 if plan.compute_dtype != jnp.float32 else jnp.float32
    if len(plan.factors) == 3:
        f0, n1, n2 = plan.factors
        ic0r, ic0i, w0r, w0i, tables5 = _inv_spectrum_tables(plan, 0, half=half)
        o, _ = _inv_dft_tiles(
            xre.astype(io), xim.astype(io), ic0r, ic0i, w0r, w0i, tables5,
            factors=plan.factors, compute_dtype=plan.compute_dtype_name,
            out_dtype=jnp.float32, real_out=True,
        )
        return o.reshape(h, n)
    f00, f0, n1, n2 = plan.factors
    fb = _half_bands(f00) if half else f00
    r = n // f00
    rt = r // 128
    ic0r, ic0i, w0r, w0i, tables5 = _inv_spectrum_tables(plan, 1)
    zre, zim = _inv_dft_tiles(
        xre.reshape(h * fb, f0, n1, n2).astype(io),
        xim.reshape(h * fb, f0, n1, n2).astype(io),
        ic0r, ic0i, w0r, w0i, tables5,
        factors=plan.factors[1:], compute_dtype=plan.compute_dtype_name,
        out_dtype=io, real_out=False,
    )
    if half:
        wts = jnp.asarray(_half_weights(f00))
        bic0r = plan.idft_re[0][:, :fb] * wts
        bic0i = plan.idft_im[0][:, :fb] * wts
    else:
        bic0r, bic0i = plan.idft_re[0], plan.idft_im[0]
    o, _ = _butterfly_tiles(
        zre.reshape(1, h, fb, rt, 128),
        zim.reshape(1, h, fb, rt, 128),
        bic0r, bic0i,
        plan.tw_re[0].reshape(f00, rt, 128)[:fb],
        plan.tw_im[0].reshape(f00, rt, 128)[:fb],
        compute_dtype=plan.compute_dtype,
        io_dtype=jnp.float32,
        packed=False,
        inverse=True,
    )
    return o.reshape(h, n)


def _kernel_spectrum(plan: FftPlan, k: jax.Array, half: bool = False):
    """Monarch-layout spectrum of the conv kernel; fused Pallas kernels on
    TPU (all plan arities), XLA einsums otherwise. half=True (long plans,
    odd-batch conv path) keeps only the lower f//2+1 outer bands."""
    if len(plan.factors) >= 3 and k.ndim == 2:
        if not _interpret():
            return _forward_long_dft(plan, k.astype(jnp.float32), half=half)
        if half:
            # interpret/CPU: full XLA spectrum, sliced to the half bands
            kfr, kfi = monarch_xla.kernel_spectrum(plan, k)
            fh = _half_bands(plan.factors[0])
            return kfr[:, :fh], kfi[:, :fh]
    if (
        len(plan.factors) == 2
        and k.ndim == 2
        and not _interpret()
        and (plan.factors[0] >= 16 or k.shape[0] % _group_size(plan.factors[0]) == 0)
    ):
        n1, n2 = plan.factors
        n = plan.seqlen
        kk = k.astype(plan.compute_dtype if plan.compute_dtype != jnp.float32 else jnp.float32)
        if kk.shape[-1] < n:
            kk = jnp.pad(kk, ((0, 0), (0, n - kk.shape[-1])))
        k4 = kk.reshape(-1, n1, n2)
        return _spectrum_tiles(
            k4,
            plan.dft_re[0], plan.dft_im[0],
            plan.tw_re[0], plan.tw_im[0],
            plan.dft_re[1], plan.dft_im[1],
            plan_factors=plan.factors,
            compute_dtype=plan.compute_dtype_name,
            out_dtype=plan.compute_dtype_name,
        )
    return monarch_xla.kernel_spectrum(plan, k)


def _tables(plan: FftPlan, base: int = 0):
    """Kernel table bundle for the 2-way (sub)decomposition at stages
    (base, base+1). For 3-factor plans base=1 gives the inner conv tables;
    the 1/N normalization lives in idft[0] (the outer stage), so the inner
    inverse is unnormalized — consistent with the pipeline."""
    return (
        plan.dft_re[base], plan.dft_im[base],
        plan.tw_re[base], plan.tw_im[base],
        plan.dft_re[base + 1], plan.dft_im[base + 1],
        plan.idft_re[base + 1], plan.idft_im[base + 1],
        plan.idft_re[base], plan.idft_im[base],
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "plan_factors", "compute_dtype", "complex_out", "out_dtype", "packed"
    ),
)
def _conv_tiles(
    u4_re,
    u4_im,
    kf_re,
    kf_im,
    tables,
    plan_factors,
    compute_dtype,
    complex_out,
    out_dtype,
    packed=False,
):
    """Run the fused kernel over (B, H, N1, N2) tiles.

    u4_im may be None (real input). Returns (o_re, o_im) with o_im None unless
    complex_out.

    packed=True: real-pair packing done inside the kernel — each grid step
    reads a (2, 1, N1, N2) block (two consecutive batch rows), convolves them
    as one complex signal (k is real, so conv(u0 + i*u1, k) splits exactly),
    and writes both real outputs back. Halves the grid with zero extra
    HBM passes. Requires even B, real input/output.
    """
    b, h, n1, n2 = u4_re.shape
    assert plan_factors == (n1, n2)

    if packed:
        assert u4_im is None and not complex_out and b % 2 == 0
        grid = (h, b // 2)
        tile_spec = pl.BlockSpec(
            (2, 1, n1, n2), lambda i, j: (j, i, 0, 0), memory_space=pltpu.VMEM
        )
    else:
        grid = (h, b)
        tile_spec = pl.BlockSpec(
            (1, 1, n1, n2), lambda i, j: (j, i, 0, 0), memory_space=pltpu.VMEM
        )
    kf_spec = pl.BlockSpec(
        (1, n1, n2), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    in_specs = [tile_spec]
    inputs = [u4_re]
    if u4_im is not None:
        in_specs.append(tile_spec)
        inputs.append(u4_im)
    in_specs += [kf_spec, kf_spec] + [table_spec] * 10
    inputs += [kf_re, kf_im, *tables]

    out_shape = [jax.ShapeDtypeStruct((b, h, n1, n2), out_dtype)]
    out_specs = [tile_spec]
    if complex_out:
        out_shape.append(jax.ShapeDtypeStruct((b, h, n1, n2), out_dtype))
        out_specs.append(tile_spec)

    def kernel(*refs):
        i = 0
        u_ref = refs[i]; i += 1
        u_im = None
        if u4_im is not None:
            u_im = refs[i]; i += 1
        (kfr, kfi, f1r, f1i, w1r, w1i, f2r, f2i, if2r, if2i, if1r, if1i) = refs[
            i : i + 12
        ]
        i += 12
        o_ref = refs[i]; i += 1
        o_im = refs[i] if complex_out else None
        _conv_kernel(
            u_ref, u_im, kfr, kfi, f1r, f1i, w1r, w1i, f2r, f2i,
            if2r, if2i, if1r, if1i, o_ref, o_im,
            compute_dtype=jnp.dtype(compute_dtype),
            packed=packed,
        )

    flops_per_step = 2 * (4 * n1 * n1 * n2 + 4 * n1 * n2 * n2 + 2 * n1 * n1 * n2)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if complex_out else out_specs[0],
        out_shape=out_shape if complex_out else out_shape[0],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_step * b * h,
            bytes_accessed=(b * h * n1 * n2) * (4 + 4 + 8),
            transcendentals=0,
        ),
    )(*inputs)
    if complex_out:
        return outs[0], outs[1]
    return outs, None


def _io_dtype(plan: FftPlan, x_dtype):
    """Kernel HBM I/O dtype: keep bf16/f16 activations narrow (halves DMA
    bytes; matmul operands are cast to the compute dtype regardless), f32
    compute keeps f32 I/O."""
    if plan.compute_dtype == jnp.float32:
        return jnp.float32
    if jnp.dtype(x_dtype).itemsize <= 2:
        # f16 kernels don't lower on Mosaic; bf16 carries 16-bit I/O.
        return jnp.bfloat16
    return jnp.float32


def _layout(plan: FftPlan, x: jax.Array, dtype=jnp.float32) -> jax.Array:
    """(..., L<=N) -> (..., N1, N2), zero-padded (the implicit causal
    padding; XLA fuses this with the layout copy)."""
    n = plan.seqlen
    n1, n2 = plan.factors
    length = x.shape[-1]
    x = x.astype(dtype)
    if length < n:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n - length)])
    return x.reshape(*x.shape[:-1], n1, n2)


def _unlayout(plan: FftPlan, x4: jax.Array, length: int) -> jax.Array:
    n = plan.seqlen
    x = x4.reshape(*x4.shape[:-2], n)
    return x[..., :length]


def _bwd_kernel(
    u_ref,
    g_ref,
    kf_re_ref,
    kf_im_ref,
    f1re_ref,
    f1im_ref,
    w1re_ref,
    w1im_ref,
    f2re_ref,
    f2im_ref,
    if2re_ref,
    if2im_ref,
    if1re_ref,
    if1im_ref,
    du_ref,
    y_ref,  # None when ungated (no postgate cotangent needed)
    dk_re_ref,
    dk_im_ref,
    *,
    compute_dtype,
):
    """Fused backward step for one (b, h): recompute U = DFT(u), G = DFT(g),
    emit du = IDFT(G * conj(K)), y = IDFT(U * K) (for dpostgate), and
    accumulate dk_f += G * conj(U) across the batch grid axis.

    The TPU analog of the reference's fused backward
    (kernels_fp16/monarch_cuda_bwd_kernel.h:417-463): same
    recompute-in-backward policy, with the per-B-tile dk_f partial summation
    done by grid-carried VMEM accumulation instead of a host-side sum
    (monarch_cuda_interface_bwd.cu:157-179)."""

    def mm(a, b):
        return jnp.dot(
            a.astype(compute_dtype),
            b.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )

    def cmul(are, aim, bre, bim):
        return are * bre - aim * bim, are * bim + aim * bre

    f1re, f1im = f1re_ref[...], f1im_ref[...]
    w1re, w1im = w1re_ref[...], w1im_ref[...]
    f2re, f2im = f2re_ref[...], f2im_ref[...]
    if2re, if2im = if2re_ref[...], if2im_ref[...]
    if1re, if1im = if1re_ref[...], if1im_ref[...]
    kre, kim = kf_re_ref[0], kf_im_ref[0]

    f2s = f2re + f2im      # Karatsuba sum tables (3-matmul complex products)
    if2s = if2re + if2im

    def fwd_dft(x):
        # real (N1, N2) -> planar spectrum
        xre, xim = mm(f1re, x), mm(f1im, x)
        xre, xim = cmul(xre, xim, w1re, w1im)
        t1, t2 = mm(xre, f2re), mm(xim, f2im)
        t3 = mm(xre + xim, f2s)
        return t1 - t2, t3 - t1 - t2

    def inv_dft_real(xre, xim):
        t1, t2 = mm(xre, if2re), mm(xim, if2im)
        t3 = mm(xre + xim, if2s)
        rr, ri = cmul(t1 - t2, t3 - t1 - t2, w1re, -w1im)
        return mm(if1re, rr) - mm(if1im, ri)

    ure, uim = fwd_dft(u_ref[0, 0])
    gre, gim = fwd_dft(g_ref[0, 0])

    # dk_f partial: G * conj(U), accumulated across the (minor) batch axis.
    pre_, pim_ = gre * ure + gim * uim, gim * ure - gre * uim
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dk_re_ref[0] = pre_
        dk_im_ref[0] = pim_

    @pl.when(j > 0)
    def _():
        dk_re_ref[0] += pre_
        dk_im_ref[0] += pim_

    # du = IDFT(G * conj(K)) — circular correlation.
    dre, dim = cmul(gre, gim, kre, -kim)
    du_ref[0, 0] = inv_dft_real(dre, dim).astype(du_ref.dtype)

    if y_ref is not None:
        yre, yim = cmul(ure, uim, kre, kim)
        y_ref[0, 0] = inv_dft_real(yre, yim).astype(y_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "plan_factors", "seqlen", "compute_dtype", "need_y", "ht", "gated"
    ),
)
def _bwd_fused_io_tiles(
    u, g_, kf_re, kf_im, tables, plan_factors, seqlen, compute_dtype, need_y, ht,
    gated=False, pre=None, post=None,
):
    """Fully-fused 2-factor backward with direct (B, H, L) I/O: per channel
    group, recompute U = DFT(u), G = DFT(g), emit du = IDFT(G * conj(K)) and
    (optionally) y = IDFT(U * K), and accumulate dk_f += G * conj(U) across
    the batch grid axis. Relayout/padding/truncation happen in-kernel.
    Channel-grouped matmuls as in _conv_fused_io_tiles.

    gated=True is the gate-fused variant: u/g_ are the RAW u and dout
    strips, pre/post the gates; ug = u*pre and g = dout*post form at load
    and the gate products (du = du_inner*pre, dpre = du_inner*u,
    dpost = y_inner*dout) at store, so the call returns
    (du, dpre, dpost, dkf_re, dkf_im) with no XLA gate passes."""
    b, h, length = u.shape
    n1, n2 = plan_factors
    n = seqlen
    g = _group_size(n1)
    assert ht % g == 0 and h % ht == 0
    grid = (h // ht, b)

    io_spec = pl.BlockSpec(
        (1, ht, length), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
    )
    kf_spec = pl.BlockSpec((ht, n1, n2), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    small = pl.BlockSpec(memory_space=pltpu.VMEM)

    f1r_t, f1i_t, w1r_t, w1i_t, f2r_t, f2i_t, if2r_t, if2i_t, if1r_t, if1i_t = tables
    f1r_t, f1i_t = _block_diag(f1r_t, f1i_t, g)
    if1r_t, if1i_t = _block_diag(if1r_t, if1i_t, g)
    tables = (f1r_t, f1i_t, w1r_t, w1i_t, f2r_t, f2i_t, if2r_t, if2i_t, if1r_t, if1i_t)

    row = jax.ShapeDtypeStruct((b, h, length), u.dtype)
    n_rows = 3 if gated else (2 if need_y else 1)  # du[, dpre, dpost | y]
    out_shape = [row] * n_rows
    out_specs = [io_spec] * n_rows
    out_shape += [jax.ShapeDtypeStruct((h, n1, n2), jnp.float32)] * 2
    out_specs += [kf_spec, kf_spec]

    def kernel(*refs):
        i = 0
        u_ref = pre_ref = post_ref = None
        if gated:
            u_ref, pre_ref, g_ref, post_ref = refs[:4]; i = 4
        else:
            u_ref, g_ref = refs[:2]; i = 2
        kfr, kfi = refs[i], refs[i + 1]; i += 2
        (f1r, f1i, w1r, w1i, f2r, f2i, if2r, if2i, if1r, if1i) = refs[i:i + 10]
        i += 10
        outs = refs[i:]
        dpre_ref = dpost_ref = y_ref = None
        if gated:
            du_ref, dpre_ref, dpost_ref, dkr, dki = outs
        elif need_y:
            du_ref, y_ref, dkr, dki = outs
        else:
            du_ref, dkr, dki = outs

        def mm(a, bb):
            return jnp.dot(
                a.astype(compute_dtype), bb.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )

        def cmul(are, aim, bre, bim):
            return are * bre - aim * bim, are * bim + aim * bre

        f1r_m, f1i_m = f1r[...], f1i[...]
        w1r_m = w1r[...][None]
        w1i_m = w1i[...][None]
        f2r_m, f2i_m = f2r[...], f2i[...]
        if2r_m, if2i_m = if2r[...], if2i[...]
        if1r_m, if1i_m = if1r[...], if1i[...]
        j = pl.program_id(1)

        def m2(x3):
            return x3.reshape(g * n1, n2)

        def m3(x2):
            return x2.reshape(g, n1, n2)

        f2s_m = f2r_m + f2i_m    # Karatsuba sum tables
        if2s_m = if2r_m + if2i_m

        def fwd_dft(x3):  # (g, n1, n2) real -> planar (g, n1, n2)
            xre, xim = mm(f1r_m, m2(x3)), mm(f1i_m, m2(x3))
            xre, xim = cmul(m3(xre), m3(xim), w1r_m, w1i_m)
            t1, t2 = mm(m2(xre), f2r_m), mm(m2(xim), f2i_m)
            t3 = mm(m2(xre) + m2(xim), f2s_m)
            return m3(t1 - t2), m3(t3 - t1 - t2)

        def inv_dft_real(xre, xim):
            t1, t2 = mm(m2(xre), if2r_m), mm(m2(xim), if2i_m)
            t3 = mm(m2(xre) + m2(xim), if2s_m)
            rr, ri = cmul(m3(t1 - t2), m3(t3 - t1 - t2), w1r_m, -w1i_m)
            return m3(mm(if1r_m, m2(rr)) - mm(if1i_m, m2(ri)))

        rows = length // n2

        def load(ref, sl, gate_ref=None):
            x = ref[0, sl].astype(jnp.float32)
            if gate_ref is not None:  # in-kernel ug / g gate product
                x = x * gate_ref[0, sl].astype(jnp.float32)
            x = x.reshape(g, rows, n2)
            if rows < n1:
                x = jnp.pad(x, ((0, 0), (0, n1 - rows), (0, 0)))
            return x

        for grp in range(ht // g):
            sl = slice(grp * g, (grp + 1) * g)
            ure, uim = fwd_dft(load(u_ref, sl, pre_ref if gated else None))
            gre, gim = fwd_dft(load(g_ref, sl, post_ref if gated else None))

            pre_ = gre * ure + gim * uim
            pim_ = gim * ure - gre * uim

            @pl.when(j == 0)
            def _(sl=sl, pre_=pre_, pim_=pim_):
                dkr[sl] = pre_
                dki[sl] = pim_

            @pl.when(j > 0)
            def _(sl=sl, pre_=pre_, pim_=pim_):
                dkr[sl] += pre_
                dki[sl] += pim_

            dre, dim_ = cmul(gre, gim, kfr[sl], -kfi[sl])
            du_inner = inv_dft_real(dre, dim_)[:, :rows].reshape(g, length)
            if gated:
                y_inner = inv_dft_real(*cmul(ure, uim, kfr[sl], kfi[sl]))[
                    :, :rows
                ].reshape(g, length)
                du_ref[0, sl] = (
                    du_inner * pre_ref[0, sl].astype(jnp.float32)
                ).astype(du_ref.dtype)
                dpre_ref[0, sl] = (
                    du_inner * u_ref[0, sl].astype(jnp.float32)
                ).astype(dpre_ref.dtype)
                dpost_ref[0, sl] = (
                    y_inner * g_ref[0, sl].astype(jnp.float32)
                ).astype(dpost_ref.dtype)
                continue
            du_ref[0, sl] = du_inner.astype(du_ref.dtype)
            if y_ref is not None:
                yre, yim = cmul(ure, uim, kfr[sl], kfi[sl])
                y_ref[0, sl] = (
                    inv_dft_real(yre, yim)[:, :rows].reshape(g, length).astype(y_ref.dtype)
                )

    sig = [u, pre, g_, post] if gated else [u, g_]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[io_spec] * len(sig) + [kf_spec, kf_spec] + [small] * 10,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
        compiler_params=None if _interpret() else _compiler_params(),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * n * (n1 + n2) * (3 if need_y or gated else 2) * 2,
            bytes_accessed=b * h * length * (8 if need_y or gated else 6),
            transcendentals=0,
        ),
    )(*sig, kf_re, kf_im, *tables)
    if gated:
        du, dpre, dpost, dkr, dki = outs
        return du, dpre, dpost, dkr, dki
    if need_y:
        du, y, dkr, dki = outs
    else:
        (du, dkr, dki), y = outs, None
    return du, y, dkr, dki


@functools.partial(
    jax.jit,
    static_argnames=("seqlen", "compute_dtype", "need_y", "ht", "gated"),
)
def _direct_bwd_fused_io_tiles(
    u, g_, kf_re, kf_im, cre, cim, icre, icim,
    seqlen, compute_dtype, need_y, ht, gated=False, pre=None, post=None,
):
    """Fully-fused direct-DFT backward (1-factor plans, N <= 1024): per grid
    step, recompute U = x @ C and G = dout @ C (table-sliced for L < N, as
    in the forward), emit du = (G * conj(K)) @ IC and optionally
    y = (U * K) @ IC, and accumulate dk_f += sum_rows G * conj(U) across the
    batch grid axis — ONE HBM round trip where the general-path composite
    pays ~4 (y recompute, du conv, two dk transforms). gated=True takes raw
    u/pre/dout/post and emits du/dpre/dpost directly, mirroring
    _bwd_fused_io_tiles. cre/cim are (L, N); icre/icim are (N, L)."""
    b, h, length = u.shape
    n = seqlen
    assert cre.shape == (length, n) and icre.shape == (n, length)
    assert h % ht == 0 and b % 2 == 0
    grid = (h // ht, b // 2)

    io_spec = pl.BlockSpec(
        (2, ht, length), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
    )
    kf_spec = pl.BlockSpec((ht, n), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    small = pl.BlockSpec(memory_space=pltpu.VMEM)

    row = jax.ShapeDtypeStruct((b, h, length), u.dtype)
    n_rows = 3 if gated else (2 if need_y else 1)  # du[, dpre, dpost | y]
    out_shape = [row] * n_rows
    out_specs = [io_spec] * n_rows
    out_shape += [jax.ShapeDtypeStruct((h, n), jnp.float32)] * 2
    out_specs += [kf_spec, kf_spec]

    def kernel(*refs):
        i = 0
        pre_ref = post_ref = None
        if gated:
            u_ref, pre_ref, g_ref, post_ref = refs[:4]; i = 4
        else:
            u_ref, g_ref = refs[:2]; i = 2
        kfr_ref, kfi_ref = refs[i], refs[i + 1]; i += 2
        cre_ref, cim_ref, icre_ref, icim_ref = refs[i:i + 4]; i += 4
        outs = refs[i:]
        dpre_ref = dpost_ref = y_ref = None
        if gated:
            du_ref, dpre_ref, dpost_ref, dkr, dki = outs
        elif need_y:
            du_ref, y_ref, dkr, dki = outs
        else:
            du_ref, dkr, dki = outs

        def mm(a, bb):
            return jnp.dot(
                a.astype(compute_dtype), bb.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )

        j = pl.program_id(1)

        def load(ref, gate_ref):
            x = ref[...]
            if gate_ref is not None:
                x = x * gate_ref[...]
            return x.reshape(2 * ht, length)

        x = load(u_ref, pre_ref if gated else None)
        d = load(g_ref, post_ref if gated else None)
        ure, uim = mm(x, cre_ref[...]), mm(x, cim_ref[...])
        gre, gim = mm(d, cre_ref[...]), mm(d, cim_ref[...])

        # dk_f += sum over the 2 batch rows of G * conj(U)
        pr = (gre * ure + gim * uim).reshape(2, ht, n).sum(0)
        pi = (gim * ure - gre * uim).reshape(2, ht, n).sum(0)

        @pl.when(j == 0)
        def _():
            dkr[...] = pr
            dki[...] = pi

        @pl.when(j > 0)
        def _():
            dkr[...] += pr
            dki[...] += pi

        kfr = jnp.broadcast_to(kfr_ref[...][None], (2, ht, n)).reshape(2 * ht, n)
        kfi = jnp.broadcast_to(kfi_ref[...][None], (2, ht, n)).reshape(2 * ht, n)
        dre = gre * kfr + gim * kfi       # G * conj(K)
        dim_ = gim * kfr - gre * kfi
        du_inner = (
            mm(dre, icre_ref[...]) - mm(dim_, icim_ref[...])
        ).reshape(2, ht, length)
        if gated:
            y_inner = (
                mm(ure * kfr - uim * kfi, icre_ref[...])
                - mm(ure * kfi + uim * kfr, icim_ref[...])
            ).reshape(2, ht, length)
            du_ref[...] = (du_inner * pre_ref[...].astype(jnp.float32)).astype(
                du_ref.dtype
            )
            dpre_ref[...] = (du_inner * u_ref[...].astype(jnp.float32)).astype(
                dpre_ref.dtype
            )
            dpost_ref[...] = (y_inner * g_ref[...].astype(jnp.float32)).astype(
                dpost_ref.dtype
            )
            return
        du_ref[...] = du_inner.astype(du_ref.dtype)
        if y_ref is not None:
            y_ref[...] = (
                mm(ure * kfr - uim * kfi, icre_ref[...])
                - mm(ure * kfi + uim * kfr, icim_ref[...])
            ).reshape(2, ht, length).astype(y_ref.dtype)

    sig = [u, pre, g_, post] if gated else [u, g_]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[io_spec] * len(sig) + [kf_spec, kf_spec] + [small] * 4,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
        compiler_params=None if _interpret() else _compiler_params(),
        cost_estimate=pl.CostEstimate(
            # need_y/gated variants run 8 MXU matmuls per element (4 forward
            # DFTs + the du pair + the y pair) vs 6 for the plain backward.
            flops=(8 if need_y or gated else 6) * b * h * length * n * 2,
            bytes_accessed=b * h * length * (8 if need_y or gated else 6),
            transcendentals=0,
        ),
    )(*sig, kf_re, kf_im, cre, cim, icre, icim)
    if gated:
        du, dpre, dpost, dkr, dki = outs
        return du, dpre, dpost, dkr, dki
    if need_y:
        du, y, dkr, dki = outs
    else:
        (du, dkr, dki), y = outs, None
    return du, y, dkr, dki


@functools.partial(
    jax.jit, static_argnames=("plan_factors", "compute_dtype", "need_y", "io_dtype")
)
def _bwd_tiles(
    u4, g4, kf_re, kf_im, tables, plan_factors, compute_dtype, need_y, io_dtype
):
    """Run the fused backward kernel over (B, H, N1, N2) tiles. Returns
    (du4, y4 | None, dkf_re, dkf_im) with dk accumulated over B."""
    b, h, n1, n2 = u4.shape
    assert plan_factors == (n1, n2)
    grid = (h, b)
    tile_spec = pl.BlockSpec(
        (1, 1, n1, n2), lambda i, j: (j, i, 0, 0), memory_space=pltpu.VMEM
    )
    kf_spec = pl.BlockSpec((1, n1, n2), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    out_shape = [jax.ShapeDtypeStruct((b, h, n1, n2), io_dtype)]
    out_specs = [tile_spec]
    if need_y:
        out_shape.append(jax.ShapeDtypeStruct((b, h, n1, n2), io_dtype))
        out_specs.append(tile_spec)
    out_shape += [jax.ShapeDtypeStruct((h, n1, n2), jnp.float32)] * 2
    out_specs += [kf_spec, kf_spec]

    def kernel(*refs):
        u_ref, g_ref, kfr, kfi = refs[:4]
        tbl = refs[4:14]
        outs = refs[14:]
        if need_y:
            du_ref, y_ref, dkr, dki = outs
        else:
            du_ref, dkr, dki = outs
            y_ref = None
        _bwd_kernel(
            u_ref, g_ref, kfr, kfi, *tbl, du_ref, y_ref, dkr, dki,
            compute_dtype=jnp.dtype(compute_dtype),
        )

    flops_per_step = 2 * (
        2 * (2 * n1 * n1 * n2 + 4 * n1 * n2 * n2)  # two fwd DFTs
        + (2 if need_y else 1) * (4 * n1 * n2 * n2 + 2 * n1 * n1 * n2)
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tile_spec, tile_spec, kf_spec, kf_spec] + [table_spec] * 10,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_step * b * h,
            bytes_accessed=(b * h * n1 * n2) * 24,
            transcendentals=0,
        ),
    )(u4, g4, kf_re, kf_im, *tables)
    if need_y:
        du4, y4, dkr, dki = outs
    else:
        (du4, dkr, dki), y4 = outs, None
    return du4, y4, dkr, dki


def _mxu_outer_fwd(mm, c0r, c0i, xr, xi):
    """Outer f0-point DFT as low-K matmuls: (bands, f0) @ (f0, n1*n2) per
    real/imag plane. At f0 >= _MXU_OUTER_MIN_F0 the unrolled per-band VPU
    MAC formulation costs bands*f0 full-tile VPU passes and dominates the
    fused long kernel; the MXU sweep replaces it with 2 (real input) or 4
    (complex) matmuls whose low-K inefficiency is still far cheaper."""
    if xi is None:
        return mm(c0r, xr), mm(c0i, xr)
    return mm(c0r, xr) - mm(c0i, xi), mm(c0r, xi) + mm(c0i, xr)


def _mxu_outer_inv(mm, ic0r, ic0i, zr, zi, want_imag):
    """Inverse outer DFT as matmuls: (f0, bands) @ (bands, n1*n2). With
    half-band weighted tables the real-part output reconstructs all f0
    chunks of a real signal; want_imag adds the imaginary plane (packed
    pairs / complex I/O)."""
    o_re = mm(ic0r, zr) - mm(ic0i, zi)
    if not want_imag:
        return o_re, None
    return o_re, mm(ic0r, zi) + mm(ic0i, zr)


def _long_kernel(
    refs,
    *,
    f0,
    compute_dtype,
    packed,
    complex_io,
    has_pre=False,
    has_post=False,
    fori=False,
):
    """Fully-fused long convolution for one (b, h): outer f0-point DFT
    (unrolled VPU multiply-adds — f0 <= 16), outer twiddle, per-chunk inner
    2-way complex conv on the MXU, conjugate twiddle, inverse outer DFT.

    One kernel, one HBM round trip — vs the reference's three-kernel
    butterfly -> monarch_conv_complex -> butterfly_ifft pipeline
    (/root/reference/flashfftconv/conv.py:692-1733), whose intermediates cost
    it the memory-ratio drop at >=64K (SURVEY.md §3.2). VMEM (~16 MB) holds
    the entire (f0, N1, N2) signal where CUDA shmem could not.
    """
    i = 0
    u_ref = refs[i]; i += 1
    uim_ref = None
    if complex_io:
        uim_ref = refs[i]; i += 1
    kfr_ref, kfi_ref = refs[i], refs[i + 1]; i += 2
    c0_ref, s0_ref, w0r_ref, w0i_ref, ic0_ref, is0_ref = refs[i : i + 6]; i += 6
    (f1r, f1i, w1r, w1i, f2r, f2i, if2r, if2i, if1r, if1i) = refs[i : i + 10]
    i += 10
    pre_ref = post_ref = None
    if has_pre:
        pre_ref = refs[i]; i += 1
    if has_post:
        post_ref = refs[i]; i += 1
    o_ref = refs[i]; i += 1
    oim_ref = None
    if complex_io:
        oim_ref = refs[i]; i += 1
    sr_scr = si_scr = zr_scr = zi_scr = None
    if fori:  # VMEM scratch for the lax.fori_loop band path
        sr_scr, si_scr, zr_scr, zi_scr = refs[i : i + 4]

    def mm(a, b):
        return jnp.dot(
            a.astype(compute_dtype), b.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )

    def cmul(are, aim, bre, bim):
        return are * bre - aim * bim, are * bim + aim * bre

    def cmm_l(mr, mi, ms, xr, xi):
        # complex matmul M @ X via 3 real matmuls (Karatsuba; ms = mr + mi):
        # 25% fewer MXU FLOPs than the 4-matmul form, the dominant cost here.
        t1, t2, t3 = mm(mr, xr), mm(mi, xi), mm(ms, xr + xi)
        return t1 - t2, t3 - t1 - t2

    def cmm_r(xr, xi, mr, mi, ms):
        t1, t2, t3 = mm(xr, mr), mm(xi, mi), mm(xr + xi, ms)
        return t1 - t2, t3 - t1 - t2

    n1, n2 = u_ref.shape[3], u_ref.shape[4]
    t = n1 * n2
    mxu_outer = f0 >= _MXU_OUTER_MIN_F0

    # ---- load input chunks as f32 (n1, n2) tiles (fused in-gate) ----------
    def in_chunk(row, c):
        v = u_ref[row, 0, c].astype(jnp.float32)
        if pre_ref is not None:
            v = v * pre_ref[row, 0, c].astype(jnp.float32)
        return v

    def in_flat(row):
        """All f0 chunks of one row as an (f0, n1*n2) matrix (in-gated).
        Ungated rows pass through at the I/O dtype — the outer-DFT matmul
        casts to compute dtype itself, so a f32 staging copy would only
        add VMEM pressure and a convert pass."""
        if pre_ref is None:
            return u_ref[row, 0][...].reshape(f0, t)
        v = u_ref[row, 0].astype(jnp.float32) * pre_ref[row, 0].astype(jnp.float32)
        return v.reshape(f0, t)

    xs = None
    if not mxu_outer:
        if packed:
            xs = [(in_chunk(0, c), in_chunk(1, c)) for c in range(f0)]
        elif complex_io:
            xs = [
                (u_ref[0, 0, c].astype(jnp.float32), uim_ref[0, 0, c].astype(jnp.float32))
                for c in range(f0)
            ]
        else:
            xs = [(in_chunk(0, c), None) for c in range(f0)]

    # ---- outer DFT along chunks (unrolled, VPU) + outer twiddle -----------
    f1r_m, f1i_m = f1r[...], f1i[...]
    w1r_m, w1i_m = w1r[...], w1i[...]
    f2r_m, f2i_m = f2r[...], f2i[...]
    if2r_m, if2i_m = if2r[...], if2i[...]
    if1r_m, if1i_m = if1r[...], if1i[...]
    f1s_m = f1r_m + f1i_m  # Karatsuba sum tables, hoisted out of the chunk loop
    f2s_m = f2r_m + f2i_m
    if2s_m = if2r_m + if2i_m
    if1s_m = if1r_m + if1i_m

    # Bands to process: rows of the outer DFT table — f0, or f0//2+1 when
    # the caller passes half-band tables (real input, rfft symmetry).
    bands = c0_ref.shape[0]
    spec_re = spec_im = None
    if mxu_outer:
        if packed:
            fr, fi = in_flat(0), in_flat(1)
        elif complex_io:
            fr = u_ref[0, 0][...].reshape(f0, t)
            fi = uim_ref[0, 0][...].reshape(f0, t)
        else:
            fr, fi = in_flat(0), None
        sr, si = _mxu_outer_fwd(mm, c0_ref[...], s0_ref[...], fr, fi)
        spec_re = sr.reshape(bands, n1, n2)
        spec_im = si.reshape(bands, n1, n2)
    zr = zi = None
    if fori:
        # Band loop as lax.fori_loop over VMEM scratch: one compiled body
        # regardless of bands (the unrolled form crashes the compile helper
        # past ~4096 bands*n1 rows; see _BAND_FORI_ROWS).
        sr_scr[...] = spec_re
        si_scr[...] = spec_im

        def band_body(k0, carry):
            xre = sr_scr[k0]
            xim = si_scr[k0]
            w0r_k = w0r_ref[0, k0]
            w0i_k = w0i_ref[0, k0]
            xre, xim = cmul(xre, xim, w0r_k, w0i_k)
            rr, ri = cmm_l(f1r_m, f1i_m, f1s_m, xre, xim)
            xre, xim = cmul(rr, ri, w1r_m, w1i_m)
            rr, ri = cmm_r(xre, xim, f2r_m, f2i_m, f2s_m)
            xre, xim = cmul(rr, ri, kfr_ref[0, k0], kfi_ref[0, k0])
            rr, ri = cmm_r(xre, xim, if2r_m, if2i_m, if2s_m)
            xre, xim = cmul(rr, ri, w1r_m, -w1i_m)
            rr2, ri2 = cmm_l(if1r_m, if1i_m, if1s_m, xre, xim)
            zre, zim = cmul(rr2, ri2, w0r_k, -w0i_k)
            zr_scr[k0] = zre.astype(zr_scr.dtype)
            zi_scr[k0] = zim.astype(zi_scr.dtype)
            return carry

        jax.lax.fori_loop(0, bands, band_body, 0)
        zr = zr_scr[...].reshape(bands, t)
        zi = zi_scr[...].reshape(bands, t)
    zs = []
    for k0 in range(0 if fori else bands):
        if mxu_outer:
            acc_re, acc_im = spec_re[k0], spec_im[k0]
        else:
            acc_re = acc_im = None
            for c in range(f0):
                cr = c0_ref[k0, c]
                ci = s0_ref[k0, c]
                xr, xi = xs[c]
                tr = xr * cr if xi is None else xr * cr - xi * ci
                ti = xr * ci if xi is None else xr * ci + xi * cr
                acc_re = tr if acc_re is None else acc_re + tr
                acc_im = ti if acc_im is None else acc_im + ti
        # outer twiddle, then the fused inner complex conv for this chunk
        xre, xim = cmul(acc_re, acc_im, w0r_ref[0, k0], w0i_ref[0, k0])

        # inner stage 1
        rr, ri = cmm_l(f1r_m, f1i_m, f1s_m, xre, xim)
        xre, xim = cmul(rr, ri, w1r_m, w1i_m)
        # inner stage 2
        rr, ri = cmm_r(xre, xim, f2r_m, f2i_m, f2s_m)
        # spectrum multiply
        xre, xim = cmul(rr, ri, kfr_ref[0, k0], kfi_ref[0, k0])
        # inner inverse
        rr, ri = cmm_r(xre, xim, if2r_m, if2i_m, if2s_m)
        xre, xim = cmul(rr, ri, w1r_m, -w1i_m)
        rr2, ri2 = cmm_l(if1r_m, if1i_m, if1s_m, xre, xim)
        # conjugate outer twiddle; in the MXU-outer path band results are
        # stored at compute dtype (the inverse-outer matmul would truncate
        # its operands to compute dtype anyway — keeping zs f32 only costs
        # VMEM and a convert pass)
        z = cmul(rr2, ri2, w0r_ref[0, k0], -w0i_ref[0, k0])
        if mxu_outer:
            z = (z[0].astype(compute_dtype), z[1].astype(compute_dtype))
        zs.append(z)

    # ---- inverse outer DFT (carries 1/N via ic0/is0; with half-band
    # tables the weighted real-part sum reconstructs all f0 chunks) --------
    if mxu_outer:
        if not fori:
            zr = jnp.stack([z[0] for z in zs]).reshape(bands, t)
            zi = jnp.stack([z[1] for z in zs]).reshape(bands, t)
        o_re, o_im = _mxu_outer_inv(
            mm, ic0_ref[...], is0_ref[...], zr, zi,
            want_imag=packed or complex_io,
        )
        o_re = o_re.reshape(f0, n1, n2)
        o_im = None if o_im is None else o_im.reshape(f0, n1, n2)
        if packed:
            if post_ref is not None:  # fused out-gate
                o_re = o_re * post_ref[0, 0].astype(jnp.float32)
                o_im = o_im * post_ref[1, 0].astype(jnp.float32)
            o_ref[0, 0] = o_re.astype(o_ref.dtype)
            o_ref[1, 0] = o_im.astype(o_ref.dtype)
        elif complex_io:
            o_ref[0, 0] = o_re.astype(o_ref.dtype)
            oim_ref[0, 0] = o_im.astype(oim_ref.dtype)
        else:
            if post_ref is not None:
                o_re = o_re * post_ref[0, 0].astype(jnp.float32)
            o_ref[0, 0] = o_re.astype(o_ref.dtype)
        return
    for c in range(f0):
        acc_re = acc_im = None
        for k0 in range(bands):
            cr = ic0_ref[c, k0]
            ci = is0_ref[c, k0]
            zr, zi = zs[k0]
            tr = zr * cr - zi * ci
            acc_re = tr if acc_re is None else acc_re + tr
            if packed or complex_io:
                ti = zr * ci + zi * cr
                acc_im = ti if acc_im is None else acc_im + ti
        if packed:
            if post_ref is not None:  # fused out-gate
                acc_re = acc_re * post_ref[0, 0, c].astype(jnp.float32)
                acc_im = acc_im * post_ref[1, 0, c].astype(jnp.float32)
            o_ref[0, 0, c] = acc_re.astype(o_ref.dtype)
            o_ref[1, 0, c] = acc_im.astype(o_ref.dtype)
        elif complex_io:
            o_ref[0, 0, c] = acc_re.astype(o_ref.dtype)
            oim_ref[0, 0, c] = acc_im.astype(oim_ref.dtype)
        else:
            if post_ref is not None:
                acc_re = acc_re * post_ref[0, 0, c].astype(jnp.float32)
            o_ref[0, 0, c] = acc_re.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "factors", "compute_dtype", "io_dtype", "packed", "complex_io"
    ),
)
def _long_tiles(
    u5_re, u5_im, kf_re, kf_im, outer_tables, inner_tables,
    factors, compute_dtype, io_dtype, packed, complex_io,
    pregate=None, postgate=None,
):
    """Run the fused long kernel over (B, H, f0, N1, N2) tiles. Optional
    pre/post gates (same shape/layout as the real-side input) are fused
    into the load/store — the analog of the reference's gated kernel
    entry points (GatedFlashFFTConvFunc, conv.py:3262-3268)."""
    f0, n1, n2 = factors
    b, h, f0_, n1_, n2_ = u5_re.shape
    assert factors == (f0_, n1_, n2_)
    rows = 2 if packed else 1
    if packed:
        grid = (h, b // 2)
        tile = pl.BlockSpec(
            (2, 1, f0, n1, n2), lambda i, j: (j, i, 0, 0, 0), memory_space=pltpu.VMEM
        )
    else:
        grid = (h, b)
        tile = pl.BlockSpec(
            (1, 1, f0, n1, n2), lambda i, j: (j, i, 0, 0, 0), memory_space=pltpu.VMEM
        )
    bands = kf_re.shape[1]  # f0, or f0//2+1 with half-band (rfft) tables
    kf_spec = pl.BlockSpec(
        (1, bands, n1, n2), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    w0_spec = pl.BlockSpec(
        (1, bands, n1, n2), lambda i, j: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    small = pl.BlockSpec(memory_space=pltpu.VMEM)

    in_specs = [tile] + ([tile] if complex_io else [])
    in_specs += [kf_spec, kf_spec]
    in_specs += [small, small, w0_spec, w0_spec, small, small]  # outer tables
    in_specs += [small] * 10  # inner tables

    inputs = [u5_re] + ([u5_im] if complex_io else [])
    c0, s0, w0r, w0i, ic0, is0 = outer_tables
    inputs += [kf_re, kf_im, c0, s0, w0r[None], w0i[None], ic0, is0, *inner_tables]
    if pregate is not None:
        in_specs.append(tile)
        inputs.append(pregate)
    if postgate is not None:
        in_specs.append(tile)
        inputs.append(postgate)

    out_shape = [jax.ShapeDtypeStruct((b, h, f0, n1, n2), io_dtype)]
    out_specs = [tile]
    if complex_io:
        out_shape.append(jax.ShapeDtypeStruct((b, h, f0, n1, n2), io_dtype))
        out_specs.append(tile)

    fori = _fori_bands(f0, n1, bands)
    kernel = functools.partial(
        lambda *refs, **kw: _long_kernel(refs, **kw),
        f0=f0,
        compute_dtype=jnp.dtype(compute_dtype),
        packed=packed,
        complex_io=complex_io,
        has_pre=pregate is not None,
        has_post=postgate is not None,
        fori=fori,
    )
    scratch_shapes = (
        [
            pltpu.VMEM((bands, n1, n2), jnp.float32),  # spec re
            pltpu.VMEM((bands, n1, n2), jnp.float32),  # spec im
            pltpu.VMEM((bands, n1, n2), jnp.dtype(compute_dtype)),  # z re
            pltpu.VMEM((bands, n1, n2), jnp.dtype(compute_dtype)),  # z im
        ]
        if fori
        else []
    )
    inner_flops = 2 * (4 * n1 * n1 * n2 + 4 * n1 * n2 * n2 + 2 * n1 * n1 * n2)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if complex_io else out_specs[0],
        out_shape=out_shape if complex_io else out_shape[0],
        scratch_shapes=scratch_shapes,
        interpret=_interpret(),
        compiler_params=None if _interpret() else _compiler_params(),
        cost_estimate=pl.CostEstimate(
            flops=(inner_flops * f0 + 8 * f0 * f0 * n1 * n2) * b * h,
            bytes_accessed=(b * h * f0 * n1 * n2) * 16,
            transcendentals=0,
        ),
    )(*inputs)
    if complex_io:
        return outs[0], outs[1]
    return outs, None


def _outer_tables(plan: FftPlan, base: int = 0):
    """Outer-stage tables for the fused long kernel: (f0, f0) DFT/iDFT
    matrices and the (f0, N1, N2)-shaped outer twiddle."""
    f0 = plan.factors[base]
    n1, n2 = plan.factors[base + 1], plan.factors[base + 2]
    w0r = plan.tw_re[base].reshape(f0, n1, n2)
    w0i = plan.tw_im[base].reshape(f0, n1, n2)
    return (
        plan.dft_re[base], plan.dft_im[base], w0r, w0i,
        plan.idft_re[base], plan.idft_im[base],
    )


def _half_bands(f0: int) -> int:
    """Bands 0..f0/2 carry the full information of a real signal's spectrum
    along the outer factor axis: band f0-k is the conjugate of band k (with
    the fixed extra inner twist folded out by the conjugate outer twiddle),
    so only f0//2 + 1 of f0 bands are ever computed. This is the rfft
    halving the reference only implements for its 512/2048 r2r path
    (monarch_fwd_r2r.h), applied instead to every >=64K outer stage."""
    return f0 // 2 + 1


def _half_weights(f0: int) -> np.ndarray:
    """Inverse-reconstruction band weights: conjugate-pair bands contribute
    twice their real part; the DC and Nyquist bands once."""
    w = np.full(_half_bands(f0), 2.0, np.float32)
    w[0] = 1.0
    w[-1] = 1.0
    return w


def _outer_tables_half(plan: FftPlan, base: int = 0):
    """_outer_tables restricted to the lower half+1 bands: forward DFT rows
    and twiddles sliced to fh; inverse DFT columns sliced and weighted so
    the real-output sum over fh bands equals the full-band sum."""
    f0 = plan.factors[base]
    fh = _half_bands(f0)
    n1, n2 = plan.factors[base + 1], plan.factors[base + 2]
    w0r = plan.tw_re[base].reshape(f0, n1, n2)[:fh]
    w0i = plan.tw_im[base].reshape(f0, n1, n2)[:fh]
    wts = jnp.asarray(_half_weights(f0))
    return (
        plan.dft_re[base][:fh], plan.dft_im[base][:fh], w0r, w0i,
        plan.idft_re[base][:, :fh] * wts, plan.idft_im[base][:, :fh] * wts,
    )


@functools.partial(
    jax.jit, static_argnames=("compute_dtype", "io_dtype", "packed", "inverse")
)
def _butterfly_tiles(
    x_re, x_im, c_re, c_im, w_re, w_im,
    compute_dtype, io_dtype, packed, inverse, gate=None,
):
    """Pallas outer-butterfly stage for the 512K-4M pipeline, operating in
    the 128-lane layout (B, H, f00, RT, 128) with RT = R/128 so that the
    reshapes to/from the inner kernel's (f0, N1, N2) layout are free
    major-dim regroupings (no relayout passes between stages).

    Forward (inverse=False): real input -> planar complex spectra; with
    packed=True consecutive batch-row pairs combine into one complex signal
    (real conv kernel), so outputs have batch B//2.
    Inverse: planar complex (Bc, ...) -> real; packed=True unpacks the pair
    back to batch 2*Bc. The f00-point DFT matmul and the twiddle multiply
    run on in-VMEM-merged (f00, T) views (in-kernel relayout runs at the
    bandwidth floor).

    The TPU analog of the reference's butterfly kernels
    (csrc/flashfftconv/butterfly/butterfly_cuda.cu:14-676), with bf16 planar
    intermediates (the reference uses fp16).

    ``gate`` (optional, (B, H, f00, RT, 128) like the real side): fused
    elementwise gate — multiplied into the input before the forward DFT
    (in-gate) or into the output after the inverse DFT (out-gate), the
    analog of the reference's butterfly_gated / butterfly_ifft_gated
    entry points (butterfly.h:97-373). Fusing here saves a full HBM
    round trip per gate vs applying it between kernels.

    Band counts are derived from the table shapes, so half-band (rfft)
    callers simply pass sliced/weighted tables (_outer_tables_half): the
    forward emits c_re.shape[0] bands of the fi input chunks; the inverse
    reconstructs all c_re.shape[0] output chunks from fi input bands.
    """
    b, h, fi, rt, lanes = x_re.shape
    fo = c_re.shape[0]
    assert lanes == 128 and w_re.shape[0] == (fi if inverse else fo)
    # in-gates only apply to real (possibly pair-packed) forward input
    assert gate is None or inverse or x_im is None
    # Tile size bounded by VMEM (~6 MB live per step incl. f32 intermediates);
    # bigger tiles amortize per-step dispatch and make DMAs sequential.
    fmax = max(fi, fo)
    trt = min(rt, max(64, 2 ** 21 // (fmax * 128 * 8)))
    while rt % trt:
        trt //= 2
    t = trt * 128
    bc = b // 2 if (packed and not inverse) else b  # complex-side batch
    # h is the MINOR grid axis so the f32 twiddle block (index depends only
    # on s) is fetched once per s, not once per step — at 1M/B=1 the twiddle
    # re-fetch otherwise exceeds the signal traffic itself.
    grid = (bc, rt // trt, h)

    def tile(rows, f):
        return pl.BlockSpec(
            (rows, 1, f, trt, 128), lambda i, s, j: (i, j, 0, s, 0),
            memory_space=pltpu.VMEM,
        )

    w_spec = pl.BlockSpec(
        (w_re.shape[0], trt, 128), lambda i, s, j: (0, s, 0),
        memory_space=pltpu.VMEM,
    )
    small = pl.BlockSpec(memory_space=pltpu.VMEM)

    if inverse:
        in_specs = [tile(1, fi), tile(1, fi)]
        inputs = [x_re, x_im]
        if packed:
            out_shape = [jax.ShapeDtypeStruct((2 * b, h, fo, rt, 128), io_dtype)]
            out_specs = [tile(2, fo)]
        else:
            out_shape = [jax.ShapeDtypeStruct((b, h, fo, rt, 128), io_dtype)]
            out_specs = [tile(1, fo)]
        gate_spec = tile(2, fo) if packed else tile(1, fo)
    else:
        if packed:
            in_specs = [tile(2, fi)]
            inputs = [x_re]
        elif x_im is not None:
            in_specs = [tile(1, fi), tile(1, fi)]
            inputs = [x_re, x_im]
        else:
            in_specs = [tile(1, fi)]
            inputs = [x_re]
        out_shape = [jax.ShapeDtypeStruct((bc, h, fo, rt, 128), io_dtype)] * 2
        out_specs = [tile(1, fo), tile(1, fo)]
        gate_spec = tile(2, fi) if packed else tile(1, fi)

    in_specs += [small, small, w_spec, w_spec]
    inputs += [c_re, c_im, w_re, w_im]
    n_in_x = len(inputs) - 4
    if gate is not None:
        in_specs.append(gate_spec)
        inputs.append(gate)

    def kernel(*refs):
        xrefs = refs[:n_in_x]
        cr_ref, ci_ref, wr_ref, wi_ref = refs[n_in_x : n_in_x + 4]
        g_ref = None
        rest = refs[n_in_x + 4 :]
        if gate is not None:
            g_ref, rest = rest[0], rest[1:]
        outs = rest

        def mm(m, v):
            return jnp.dot(
                m.astype(compute_dtype), v.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )

        def flat(ref, row, f):
            return ref[row, 0].reshape(f, t)

        if inverse or (not packed and len(xrefs) == 2):
            xr = flat(xrefs[0], 0, fi)
            xi = flat(xrefs[1], 0, fi)
        elif packed:
            xr = flat(xrefs[0], 0, fi)
            xi = flat(xrefs[0], 1, fi)
        else:
            xr = flat(xrefs[0], 0, fi)
            xi = None
        if g_ref is not None and not inverse:
            # fused in-gate: real signal(s) gated before the DFT
            xr = xr * flat(g_ref, 0, fi)
            if packed:
                xi = xi * flat(g_ref, 1, fi)

        wf = fi if inverse else fo
        wr = wr_ref[...].reshape(wf, t)
        wi = wi_ref[...].reshape(wf, t)
        cr, ci = cr_ref[...], ci_ref[...]
        if inverse:
            zr = xr * wr + xi * wi         # conjugate twiddle
            zi = xi * wr - xr * wi
            yr = mm(cr, zr) - mm(ci, zi)   # cr/ci carry the 1/N scale
            # (with half-band weighted tables this real-part sum over fi
            # bands reconstructs all fo chunks of the real signal)
            if packed:
                yi = mm(cr, zi) + mm(ci, zr)
                if g_ref is not None:      # fused out-gate
                    yr = yr * flat(g_ref, 0, fo)
                    yi = yi * flat(g_ref, 1, fo)
                outs[0][0, 0] = yr.reshape(fo, trt, 128).astype(outs[0].dtype)
                outs[0][1, 0] = yi.reshape(fo, trt, 128).astype(outs[0].dtype)
            else:
                if g_ref is not None:
                    yr = yr * flat(g_ref, 0, fo)
                outs[0][0, 0] = yr.reshape(fo, trt, 128).astype(outs[0].dtype)
        else:
            if xi is None:
                yr, yi = mm(cr, xr), mm(ci, xr)
            else:
                yr = mm(cr, xr) - mm(ci, xi)
                yi = mm(cr, xi) + mm(ci, xr)
            yr, yi = yr * wr - yi * wi, yr * wi + yi * wr
            outs[0][0, 0] = yr.reshape(fo, trt, 128).astype(outs[0].dtype)
            outs[1][0, 0] = yi.reshape(fo, trt, 128).astype(outs[1].dtype)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        out_shape=out_shape if len(out_shape) > 1 else out_shape[0],
        interpret=_interpret(),
        compiler_params=None if _interpret() else _compiler_params(),
        cost_estimate=pl.CostEstimate(
            flops=8 * bc * h * fi * fo * rt * 128,
            bytes_accessed=bc * h * (fi + fo) * rt * 128 * 6,
            transcendentals=0,
        ),
    )(*inputs)
    if isinstance(outs, (list, tuple)):
        return outs[0], outs[1]
    return outs, None


def _conv_raw_xla_direct(plan, ug, kf_re, kf_im, postgate, length, out_dtype):
    """Conv via XLA Monarch einsums with kf already in Monarch layout.
    Fallback for shapes the tile kernels can't take (also: 1-factor Monarch
    layout == natural order, so this is the whole direct-DFT path)."""
    x = ug.astype(jnp.float32)
    if length < plan.seqlen:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, plan.seqlen - length)])
    xre, xim = monarch_xla.monarch_dft(plan, x)
    yre = xre * kf_re - xim * kf_im
    yim = xre * kf_im + xim * kf_re
    ore, _ = monarch_xla.monarch_idft(plan, yre, yim)
    out = ore[..., :length]
    if postgate is not None:
        out = out * postgate.astype(jnp.float32)
    return out.astype(out_dtype)


def _kf_cast(plan, kf_re, kf_im):
    """Kernel-spectrum HBM dtype for the tile kernels: the compute dtype
    (bf16). At small B the f32 spectrum read otherwise dominates HBM traffic
    (e.g. 1M/B=1: 805 MB of k_f vs 402 MB of signal). The reference stores
    k_f at compute dtype too (fp16; conv.py:585)."""
    dt = plan.compute_dtype
    if dt == jnp.float32:
        return kf_re, kf_im
    return kf_re.astype(dt), kf_im.astype(dt)


def _use_half(plan, x) -> bool:
    """rfft band-halving applies on the >=64K paths when batch-pair packing
    is unavailable (odd/unit batch) — packing and halving are alternative
    exploitations of the same input realness, each worth ~2x on the outer
    bands. The kernel spectrum must be computed at matching bands
    (_kernel_spectrum(half=...)). Big-tile 3-factor plans additionally
    force half-band when the packed working set would not fit the VMEM
    budget (packing doubles both the I/O rows and the outer bands)."""
    if len(plan.factors) < 3:
        return False
    b = x.shape[0] if x.ndim == 3 else 1
    if b % 2 == 1 or b < 2:
        return True
    f0, n1, n2 = plan.factors[-3:]
    if (
        len(plan.factors) == 3
        and not (n1 * n2 <= MAX_FUSED_SEQLEN
                 and f0 * n1 * n2 <= 8 * MAX_FUSED_SEQLEN)
        and _fused3_vmem_mb(plan, packed=True, gated=True)
        > plan_mod.vmem_budget_mb()
    ):
        return True
    return False


def _conv_raw(plan, u, kf_re, kf_im, pregate, postgate, out_dtype):
    """postgate * iFFT(FFT(pre*u) * k_f)[:L] with k_f given in Monarch layout.
    For long plans k_f has half (f//2+1) outer bands iff _use_half(plan, u)."""
    length = u.shape[-1]
    ug = u if pregate is None else u * pregate

    both_gates = pregate is not None and postgate is not None
    no_gates = pregate is None and postgate is None
    if len(plan.factors) == 1:
        io = _io_dtype(plan, u.dtype)
        cd = plan.compute_dtype
        ht = next((t for t in (64, 32, 16, 8) if u.ndim == 3 and u.shape[1] % t == 0), None)
        if (
            ht is not None
            and length % 128 == 0
            and u.shape[0] % 2 == 0
            and (both_gates or no_gates)
        ):
            # L < N (padded conv): slice the DFT tables instead of padding
            # the signal — x_pad @ C == x @ C[:L], y[..., :L] == y @ IC[:, :L]
            # (length stays a lane-tile multiple for the MXU contraction).
            out = _direct_fused_io_tiles(
                u.astype(io),
                kf_re,
                kf_im,
                pregate.astype(io) if both_gates else None,
                postgate.astype(io) if both_gates else None,
                plan.dft_re[0][:length].astype(cd),
                plan.dft_im[0][:length].astype(cd),
                plan.idft_re[0][:, :length].astype(cd),
                plan.idft_im[0][:, :length].astype(cd),
                seqlen=plan.seqlen,
                compute_dtype=plan.compute_dtype_name,
                gated=both_gates,
                ht=ht,
            )
            return out.astype(out_dtype)
        # fall back: XLA einsum direct path
        return _conv_raw_xla_direct(plan, ug, kf_re, kf_im, postgate, length, out_dtype)

    kf_re, kf_im = _kf_cast(plan, kf_re, kf_im)
    if len(plan.factors) == 2:
        io = _io_dtype(plan, u.dtype)
        ht = _h_tile(*plan.factors, u.shape[1]) if u.ndim == 3 else None
        if (
            ht is not None
            and u.shape[0] % 2 == 0
            and length % plan.factors[1] == 0
            and (both_gates or no_gates)
        ):
            # Fully-fused I/O path: relayout, padding and gating in-kernel.
            out = _conv_fused_io_tiles(
                u.astype(io),
                kf_re,
                kf_im,
                pregate.astype(io) if both_gates else None,
                postgate.astype(io) if both_gates else None,
                _tables(plan),
                plan_factors=plan.factors,
                seqlen=plan.seqlen,
                compute_dtype=plan.compute_dtype_name,
                gated=both_gates,
                ht=ht,
            )
            return out.astype(out_dtype)
        if plan.factors[0] < 16:
            # sub-tile n1 (bf16 needs >= 16 sublanes, f32 >= 8); tiny-n1 odd
            # shapes go to XLA instead of the per-channel tile kernels.
            return _conv_raw_xla_direct(
                plan, ug, kf_re, kf_im, postgate, length, out_dtype
            )
        u4 = _layout(plan, ug, dtype=io)
        packed = u4.ndim == 4 and u4.shape[0] % 2 == 0 and u4.shape[0] >= 2
        o4, _ = _conv_tiles(
            u4,
            None,
            kf_re,
            kf_im,
            _tables(plan),
            plan_factors=plan.factors,
            compute_dtype=plan.compute_dtype_name,
            complex_out=False,
            out_dtype=io,
            packed=packed,
        )
        out = _unlayout(plan, o4, length).astype(jnp.float32)
    elif len(plan.factors) == 3:
        # Fully-fused long path (64K-256K): outer butterfly + inner conv +
        # inverse butterfly in ONE kernel (one HBM round trip); pre/post
        # gates fused into the kernel's load/store; (L,) <-> Monarch
        # relayout in-kernel when L % n2 == 0 (no HBM relayout copies).
        f0, n1, n2 = plan.factors
        n = plan.seqlen
        io = _io_dtype(plan, u.dtype)

        def shape_in(v):
            v = v.astype(io)
            if v.ndim == 2:
                v = v[None]
            if length < n:
                v = jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(0, n - length)])
            return v.reshape(v.shape[0], v.shape[1], f0, n1, n2)

        squeeze = u.ndim == 2
        x5 = shape_in(u)
        b, h = x5.shape[:2]
        half = _use_half(plan, u)
        packed = b % 2 == 0 and b >= 2 and not half
        o5, _ = _long_tiles(
            x5,
            None,
            kf_re,
            kf_im,
            _outer_tables_half(plan) if half else _outer_tables(plan),
            _tables(plan, base=1),
            factors=plan.factors,
            compute_dtype=plan.compute_dtype_name,
            io_dtype=io,
            packed=packed,
            complex_io=False,
            pregate=None if pregate is None else shape_in(pregate),
            postgate=None if postgate is None else shape_in(postgate),
        )
        postgate = None  # consumed in-kernel
        out = o5.reshape(b, h, n)[..., :length]
        if squeeze:
            out = out[0]
    else:
        # 4-level pipeline (512K-4M): Pallas outer butterfly over factor 0
        # (real-pair packed, bf16 planar intermediates) + fused long kernel
        # (complex I/O) over factors 1..3 + inverse Pallas butterfly.
        f00, f0, n1, n2 = plan.factors
        n = plan.seqlen
        r = n // f00
        io = _io_dtype(plan, u.dtype)
        rt = r // 128

        def shape_in(v):
            # The ONLY relayout: (B,H,N) -> 128-lane 5D (fused with the pad).
            # Every reshape between the stages below is a free major-dim
            # regroup.
            v = v.astype(io)
            if v.ndim == 2:
                v = v[None]
            if length < n:
                v = jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(0, n - length)])
            return v.reshape(v.shape[0], v.shape[1], f00, rt, 128)

        squeeze = u.ndim == 2
        b0 = u.shape[0] if u.ndim == 3 else 1
        packed = b0 % 2 == 0 and b0 >= 2
        x = shape_in(u)
        b, h = x.shape[:2]
        half = _use_half(plan, u)
        fb = _half_bands(f00) if half else f00
        w0r = plan.tw_re[0].reshape(f00, rt, 128)
        w0i = plan.tw_im[0].reshape(f00, rt, 128)
        if half:
            wts = jnp.asarray(_half_weights(f00))
            bic0r = plan.idft_re[0][:, :fb] * wts
            bic0i = plan.idft_im[0][:, :fb] * wts
        else:
            bic0r, bic0i = plan.idft_re[0], plan.idft_im[0]
        # pre/post gates fused into the outer butterfly stages — the analog
        # of the reference's butterfly_padded_gated_* entry points
        # (conv.py:3374-3391, 3659-3676).
        bre, bim = _butterfly_tiles(
            x, None,
            plan.dft_re[0][:fb], plan.dft_im[0][:fb], w0r[:fb], w0i[:fb],
            compute_dtype=plan.compute_dtype,
            io_dtype=io,
            packed=packed,
            inverse=False,
            gate=None if pregate is None else shape_in(pregate),
        )
        bc = b // 2 if packed else b
        ore, oim = _long_tiles(
            bre.reshape(bc, h * fb, f0, n1, n2),
            bim.reshape(bc, h * fb, f0, n1, n2),
            kf_re.reshape(h * fb, f0, n1, n2),
            kf_im.reshape(h * fb, f0, n1, n2),
            _outer_tables(plan, base=1),
            _tables(plan, base=2),
            factors=plan.factors[1:],
            compute_dtype=plan.compute_dtype_name,
            io_dtype=io,
            packed=False,
            complex_io=True,
        )
        o, _ = _butterfly_tiles(
            ore.reshape(bc, h, fb, rt, 128),
            oim.reshape(bc, h, fb, rt, 128),
            bic0r, bic0i, w0r[:fb], w0i[:fb],
            compute_dtype=plan.compute_dtype,
            io_dtype=io,
            packed=packed,
            inverse=True,
            gate=None if postgate is None else shape_in(postgate),
        )
        out = o.reshape(b, h, n)[..., :length]
        postgate = None  # consumed in-kernel
        if squeeze:
            out = out[0]

    if postgate is not None:
        out = out * postgate.astype(jnp.float32)
    return out.astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fft_conv_pallas_gated(plan_key, u, k, pregate, postgate):
    plan = _PLAN_REGISTRY[plan_key]
    kf_re, kf_im = _kernel_spectrum(plan, k, half=_use_half(plan, u))
    return _conv_raw(plan, u, kf_re, kf_im, pregate, postgate, u.dtype)


def _gated_fwd(plan_key, u, k, pregate, postgate):
    return _fft_conv_pallas_gated(plan_key, u, k, pregate, postgate), (
        u,
        k,
        pregate,
        postgate,
    )


def _long_bwd_kernel(refs, *, f0, compute_dtype, need_y, complex_io=False,
                     gated=False, fori=False):
    """Fully-fused 3-factor backward for one (b, h): in ONE HBM round trip,
    recompute Ug = DFT(ug) and G = DFT(g) (outer half-band DFT + twiddle +
    2-way inner Monarch chain, as in _long_kernel), then emit
    du = iDFT(G * conj(K_f)), optionally y = iDFT(Ug * K_f) (for dpostgate),
    and accumulate dk_f += G * conj(Ug) across the batch grid axis.

    complex_io=True is the 4-factor inner stage (the rows are the outer
    Pallas butterfly's complex output, as in the forward's _long_tiles
    complex path): full-band outer tables, complex du/y rows out.

    The TPU analog of the reference's >=64K backward — which re-runs the
    3-kernel butterfly pipeline twice plus host-side dk reduction
    (/root/reference/flashfftconv/conv.py:1867-3233) — collapsed to one
    kernel, trading ~2x transform FLOPs (two signals, no real-pair packing)
    for the elimination of every HBM-resident spectrum intermediate the
    separate-transform backward pays for (measured fwd_bwd/fwd 4.7-6.0 at
    64K-256K with the separate-transform scheme, results_v5e_r3.csv)."""
    i = 0
    u_ref = pre_ref = dout_ref = post_ref = None
    ugi_ref = gi_ref = None
    if complex_io:
        ugr_ref, ugi_ref, gr_ref, gi_ref = refs[:4]; i = 4
    elif gated:
        # Gate-fused variant: raw u/pre/dout/post rows in, du/dpre/dpost
        # rows out — ug = u*pre and g = dout*post form at load, and all
        # three gate products form at store, eliminating the 4 XLA
        # elementwise passes (make-ug, make-g, apply-pre, apply-post) the
        # unfused backward pays around the kernel.
        u_ref, pre_ref, dout_ref, post_ref = refs[:4]; i = 4
        ugr_ref = gr_ref = None
    else:
        ugr_ref, gr_ref = refs[:2]; i = 2
    kfr_ref, kfi_ref = refs[i], refs[i + 1]; i += 2
    c0_ref, s0_ref, w0r_ref, w0i_ref, ic0_ref, is0_ref = refs[i:i + 6]; i += 6
    (f1r, f1i, w1r, w1i, f2r, f2i, if2r, if2i, if1r, if1i) = refs[i:i + 10]
    i += 10
    du_ref = refs[i]; i += 1
    dui_ref = None
    if complex_io:
        dui_ref = refs[i]; i += 1
    dpre_ref = dpost_ref = None
    if gated:
        dpre_ref = refs[i]; i += 1
        dpost_ref = refs[i]; i += 1
    y_ref = yi_ref = None
    if need_y and not gated:
        y_ref = refs[i]; i += 1
        if complex_io:
            yi_ref = refs[i]; i += 1
    dkr_ref, dki_ref = refs[i], refs[i + 1]; i += 2
    ur_scr = ui_scr = gr_scr = gi_scr = None
    zdur_scr = zdui_scr = zyr_scr = zyi_scr = None
    if fori:  # VMEM scratch for the lax.fori_loop band path
        ur_scr, ui_scr, gr_scr, gi_scr = refs[i : i + 4]; i += 4
        zdur_scr, zdui_scr = refs[i : i + 2]; i += 2
        if need_y:
            zyr_scr, zyi_scr = refs[i : i + 2]

    def mm(a, b):
        return jnp.dot(
            a.astype(compute_dtype), b.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )

    def cmul(are, aim, bre, bim):
        return are * bre - aim * bim, are * bim + aim * bre

    def cmm_l(mr, mi, ms, xr, xi):
        t1, t2, t3 = mm(mr, xr), mm(mi, xi), mm(ms, xr + xi)
        return t1 - t2, t3 - t1 - t2

    def cmm_r(xr, xi, mr, mi, ms):
        t1, t2, t3 = mm(xr, mr), mm(xi, mi), mm(xr + xi, ms)
        return t1 - t2, t3 - t1 - t2

    f1r_m, f1i_m = f1r[...], f1i[...]
    w1r_m, w1i_m = w1r[...], w1i[...]
    f2r_m, f2i_m = f2r[...], f2i[...]
    if2r_m, if2i_m = if2r[...], if2i[...]
    if1r_m, if1i_m = if1r[...], if1i[...]
    f1s_m = f1r_m + f1i_m
    f2s_m = f2r_m + f2i_m
    if2s_m = if2r_m + if2i_m
    if1s_m = if1r_m + if1i_m

    sig_ref = u_ref if gated else ugr_ref
    n1, n2 = sig_ref.shape[3], sig_ref.shape[4]
    t = n1 * n2
    mxu_outer = f0 >= _MXU_OUTER_MIN_F0

    def load_pair(re_ref, im_ref, c):
        re = re_ref[0, 0, c].astype(jnp.float32)
        im = None if im_ref is None else im_ref[0, 0, c].astype(jnp.float32)
        return re, im

    def load_prod(a_ref, b_ref, c):
        """(a * b)[chunk c] in f32 — the in-kernel ug / g gate products."""
        return (
            a_ref[0, 0, c].astype(jnp.float32)
            * b_ref[0, 0, c].astype(jnp.float32),
            None,
        )

    us = gs = None
    uspec = gspec = None
    bands = c0_ref.shape[0]
    if mxu_outer:
        def flat(ref):
            return None if ref is None else ref[0, 0].astype(jnp.float32).reshape(f0, t)

        def flat_prod(a_ref, b_ref):
            v = a_ref[0, 0].astype(jnp.float32) * b_ref[0, 0].astype(jnp.float32)
            return v.reshape(f0, t)

        c0m, s0m = c0_ref[...], s0_ref[...]
        if gated:
            ur_, ui_ = _mxu_outer_fwd(mm, c0m, s0m, flat_prod(u_ref, pre_ref), None)
            gr_, gi_ = _mxu_outer_fwd(mm, c0m, s0m, flat_prod(dout_ref, post_ref), None)
        else:
            ur_, ui_ = _mxu_outer_fwd(mm, c0m, s0m, flat(ugr_ref), flat(ugi_ref))
            gr_, gi_ = _mxu_outer_fwd(mm, c0m, s0m, flat(gr_ref), flat(gi_ref))
        uspec = (ur_.reshape(bands, n1, n2), ui_.reshape(bands, n1, n2))
        gspec = (gr_.reshape(bands, n1, n2), gi_.reshape(bands, n1, n2))
    elif gated:
        us = [load_prod(u_ref, pre_ref, c) for c in range(f0)]
        gs = [load_prod(dout_ref, post_ref, c) for c in range(f0)]
    else:
        us = [load_pair(ugr_ref, ugi_ref, c) for c in range(f0)]
        gs = [load_pair(gr_ref, gi_ref, c) for c in range(f0)]
    j = pl.program_id(1)

    def fwd_inner(xre, xim):
        rr, ri = cmm_l(f1r_m, f1i_m, f1s_m, xre, xim)
        xre, xim = cmul(rr, ri, w1r_m, w1i_m)
        return cmm_r(xre, xim, f2r_m, f2i_m, f2s_m)

    def inv_inner(xre, xim, k0):
        rr, ri = cmm_r(xre, xim, if2r_m, if2i_m, if2s_m)
        xre, xim = cmul(rr, ri, w1r_m, -w1i_m)
        rr2, ri2 = cmm_l(if1r_m, if1i_m, if1s_m, xre, xim)
        return cmul(rr2, ri2, w0r_ref[0, k0], -w0i_ref[0, k0])

    zdu_mat = zy_mat = None
    if fori:
        # Band loop as lax.fori_loop over VMEM scratch (see _BAND_FORI_ROWS):
        # this is what lets the 2M/4M single-pass backwards compile at all —
        # the unrolled form crashed the remote compile helper.
        ur_scr[...] = uspec[0].astype(ur_scr.dtype)
        ui_scr[...] = uspec[1].astype(ui_scr.dtype)
        gr_scr[...] = gspec[0].astype(gr_scr.dtype)
        gi_scr[...] = gspec[1].astype(gi_scr.dtype)

        def band_body(k0, carry):
            w0r_k, w0i_k = w0r_ref[0, k0], w0i_ref[0, k0]
            ur_, ui_ = cmul(ur_scr[k0], ui_scr[k0], w0r_k, w0i_k)
            gr_, gi_ = cmul(gr_scr[k0], gi_scr[k0], w0r_k, w0i_k)
            ufr, ufi = fwd_inner(ur_, ui_)
            gfr, gfi = fwd_inner(gr_, gi_)
            pr = gfr * ufr + gfi * ufi
            pi = gfi * ufr - gfr * ufi

            @pl.when(j == 0)
            def _():
                dkr_ref[0, k0] = pr
                dki_ref[0, k0] = pi

            @pl.when(j > 0)
            def _():
                dkr_ref[0, k0] += pr
                dki_ref[0, k0] += pi

            kfr_k, kfi_k = kfr_ref[0, k0], kfi_ref[0, k0]
            dre, dim_ = cmul(gfr, gfi, kfr_k, -kfi_k)
            zre, zim = inv_inner(dre, dim_, k0)
            zdur_scr[k0] = zre.astype(zdur_scr.dtype)
            zdui_scr[k0] = zim.astype(zdui_scr.dtype)
            if need_y:
                yre, yim = cmul(ufr, ufi, kfr_k, kfi_k)
                zre, zim = inv_inner(yre, yim, k0)
                zyr_scr[k0] = zre.astype(zyr_scr.dtype)
                zyi_scr[k0] = zim.astype(zyi_scr.dtype)
            return carry

        jax.lax.fori_loop(0, bands, band_body, 0)
        zdu_mat = (zdur_scr[...].reshape(bands, t),
                   zdui_scr[...].reshape(bands, t))
        if need_y:
            zy_mat = (zyr_scr[...].reshape(bands, t),
                      zyi_scr[...].reshape(bands, t))
    zs_du, zs_y = [], []
    for k0 in range(0 if fori else bands):
        if mxu_outer:
            u_ar, u_ai = uspec[0][k0], uspec[1][k0]
            g_ar, g_ai = gspec[0][k0], gspec[1][k0]
        else:
            u_ar = u_ai = g_ar = g_ai = None
            for c in range(f0):
                cr = c0_ref[k0, c]
                ci = s0_ref[k0, c]
                ur_c, ui_c = us[c]
                gr_c, gi_c = gs[c]
                if ui_c is None:
                    tu_r, tu_i = ur_c * cr, ur_c * ci
                    tg_r, tg_i = gr_c * cr, gr_c * ci
                else:
                    tu_r, tu_i = ur_c * cr - ui_c * ci, ur_c * ci + ui_c * cr
                    tg_r, tg_i = gr_c * cr - gi_c * ci, gr_c * ci + gi_c * cr
                u_ar = tu_r if u_ar is None else u_ar + tu_r
                u_ai = tu_i if u_ai is None else u_ai + tu_i
                g_ar = tg_r if g_ar is None else g_ar + tg_r
                g_ai = tg_i if g_ai is None else g_ai + tg_i
        ur_, ui_ = cmul(u_ar, u_ai, w0r_ref[0, k0], w0i_ref[0, k0])
        gr_, gi_ = cmul(g_ar, g_ai, w0r_ref[0, k0], w0i_ref[0, k0])
        ufr, ufi = fwd_inner(ur_, ui_)
        gfr, gfi = fwd_inner(gr_, gi_)

        pr = gfr * ufr + gfi * ufi
        pi = gfi * ufr - gfr * ufi

        @pl.when(j == 0)
        def _(k0=k0, pr=pr, pi=pi):
            dkr_ref[0, k0] = pr
            dki_ref[0, k0] = pi

        @pl.when(j > 0)
        def _(k0=k0, pr=pr, pi=pi):
            dkr_ref[0, k0] += pr
            dki_ref[0, k0] += pi

        def _store_z(z):
            if mxu_outer:
                return (z[0].astype(compute_dtype), z[1].astype(compute_dtype))
            return z

        dre, dim_ = cmul(gfr, gfi, kfr_ref[0, k0], -kfi_ref[0, k0])
        zs_du.append(_store_z(inv_inner(dre, dim_, k0)))
        if need_y:
            yre, yim = cmul(ufr, ufi, kfr_ref[0, k0], kfi_ref[0, k0])
            zs_y.append(_store_z(inv_inner(yre, yim, k0)))

    # inverse outer DFT: real-input case uses half-band weighted ic0/is0
    # (real output); complex_io uses full tables and emits complex rows.
    if mxu_outer:
        ic0m, is0m = ic0_ref[...], is0_ref[...]

        def inv_block(z_pairs, z_mat=None):
            if z_mat is not None:
                zr, zi = z_mat
            else:
                zr = jnp.stack([z[0] for z in z_pairs]).reshape(bands, t)
                zi = jnp.stack([z[1] for z in z_pairs]).reshape(bands, t)
            o_re, o_im = _mxu_outer_inv(mm, ic0m, is0m, zr, zi,
                                        want_imag=complex_io)
            o_re = o_re.reshape(f0, n1, n2)
            return o_re, None if o_im is None else o_im.reshape(f0, n1, n2)

        if gated:
            # fused gate products at store: du = du_inner*pre,
            # dpre = du_inner*u, dpost = y_inner*dout
            du_inner, _ = inv_block(zs_du, zdu_mat)
            y_inner, _ = inv_block(zs_y, zy_mat)
            du_ref[0, 0] = (du_inner * pre_ref[0, 0].astype(jnp.float32)).astype(du_ref.dtype)
            dpre_ref[0, 0] = (du_inner * u_ref[0, 0].astype(jnp.float32)).astype(dpre_ref.dtype)
            dpost_ref[0, 0] = (y_inner * dout_ref[0, 0].astype(jnp.float32)).astype(dpost_ref.dtype)
            return

        def inv_store(z_pairs, re_ref_, im_ref_, z_mat=None):
            o_re, o_im = inv_block(z_pairs, z_mat)
            re_ref_[0, 0] = o_re.astype(re_ref_.dtype)
            if complex_io:
                im_ref_[0, 0] = o_im.astype(im_ref_.dtype)

        inv_store(zs_du, du_ref, dui_ref, zdu_mat)
        if need_y:
            inv_store(zs_y, y_ref, yi_ref, zy_mat)
        return
    for c in range(f0):
        acc_d = acc_di = acc_y = acc_yi = None
        for k0 in range(bands):
            cr = ic0_ref[c, k0]
            ci = is0_ref[c, k0]
            zr, zi = zs_du[k0]
            td = zr * cr - zi * ci
            acc_d = td if acc_d is None else acc_d + td
            if complex_io:
                tdi = zr * ci + zi * cr
                acc_di = tdi if acc_di is None else acc_di + tdi
            if need_y:
                zr, zi = zs_y[k0]
                ty = zr * cr - zi * ci
                acc_y = ty if acc_y is None else acc_y + ty
                if complex_io:
                    tyi = zr * ci + zi * cr
                    acc_yi = tyi if acc_yi is None else acc_yi + tyi
        if gated:
            du_ref[0, 0, c] = (acc_d * pre_ref[0, 0, c].astype(jnp.float32)).astype(du_ref.dtype)
            dpre_ref[0, 0, c] = (acc_d * u_ref[0, 0, c].astype(jnp.float32)).astype(dpre_ref.dtype)
            dpost_ref[0, 0, c] = (acc_y * dout_ref[0, 0, c].astype(jnp.float32)).astype(dpost_ref.dtype)
            continue
        du_ref[0, 0, c] = acc_d.astype(du_ref.dtype)
        if complex_io:
            dui_ref[0, 0, c] = acc_di.astype(dui_ref.dtype)
        if need_y:
            y_ref[0, 0, c] = acc_y.astype(y_ref.dtype)
            if complex_io:
                yi_ref[0, 0, c] = acc_yi.astype(yi_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("factors", "compute_dtype", "io_dtype", "need_y", "gated"),
)
def _long_bwd_tiles(
    ug5, g5, kf_re, kf_im, outer_tables, inner_tables,
    factors, compute_dtype, io_dtype, need_y,
    ug5_im=None, g5_im=None, gated=False, pre5=None, post5=None,
):
    """Run the fused long backward over (B, H, f0, N1, N2) tiles with
    half-band outer tables (_outer_tables_half). Returns
    (du5, y5 | None, dkf_re, dkf_im) with dk accumulated over B in the
    half-band Monarch spectrum layout (H, fb, N1, N2) f32.

    Passing ug5_im/g5_im switches to complex I/O (the 4-factor inner stage:
    rows are the outer butterfly's complex output, outer_tables must be the
    full-band _outer_tables): returns (du5, du5_im, y5, y5_im | Nones,
    dkf_re, dkf_im).

    gated=True is the gate-fused variant: ug5/g5 are the RAW u and dout
    rows, pre5/post5 the gates; ug = u*pre and g = dout*post form in-kernel
    at load, and the gate products form at store, so the call returns
    (du5, dpre5, dpost5, dkf_re, dkf_im) directly — no XLA gate passes."""
    f0, n1, n2 = factors
    complex_io = ug5_im is not None
    b, h = ug5.shape[:2]
    grid = (h, b)
    tile = pl.BlockSpec(
        (1, 1, f0, n1, n2), lambda i, j: (j, i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    bands = kf_re.shape[1]
    kf_spec = pl.BlockSpec(
        (1, bands, n1, n2), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    w0_spec = pl.BlockSpec(
        (1, bands, n1, n2), lambda i, j: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    small = pl.BlockSpec(memory_space=pltpu.VMEM)

    c0, s0, w0r, w0i, ic0, is0 = outer_tables
    if complex_io:
        sig = [ug5, ug5_im, g5, g5_im]
    elif gated:
        sig = [ug5, pre5, g5, post5]  # raw u, pre, dout, post rows
    else:
        sig = [ug5, g5]
    in_specs = [tile] * len(sig) + [kf_spec, kf_spec,
                small, small, w0_spec, w0_spec, small, small] + [small] * 10
    inputs = sig + [kf_re, kf_im, c0, s0, w0r[None], w0i[None], ic0, is0,
                    *inner_tables]

    row = jax.ShapeDtypeStruct((b, h, f0, n1, n2), io_dtype)
    if gated:
        n_rows = 3  # du, dpre, dpost
    else:
        n_rows = (2 if complex_io else 1) * (2 if need_y else 1)
    out_shape = [row] * n_rows
    out_specs = [tile] * n_rows
    out_shape += [jax.ShapeDtypeStruct((h, bands, n1, n2), jnp.float32)] * 2
    out_specs += [kf_spec, kf_spec]

    fori = _fori_bands(f0, n1, bands)
    kernel = functools.partial(
        lambda *refs, **kw: _long_bwd_kernel(refs, **kw),
        f0=f0,
        compute_dtype=jnp.dtype(compute_dtype),
        need_y=need_y or gated,
        complex_io=complex_io,
        gated=gated,
        fori=fori,
    )
    scratch_shapes = []
    if fori:
        # Spectra staged at COMPUTE dtype (unlike the forward's f32): the
        # backward carries 4 spectra + 2-4 z buffers and the gated 2M shapes
        # measured 136.91M of 128M physical VMEM with f32 staging — the
        # first matmul truncates to compute dtype anyway.
        zbuf = pltpu.VMEM((bands, n1, n2), jnp.dtype(compute_dtype))
        scratch_shapes = [zbuf] * 6  # u/g spectra + z_du
        if need_y or gated:
            scratch_shapes += [zbuf] * 2  # z_y
    inner_flops = 2 * (4 * n1 * n1 * n2 + 4 * n1 * n2 * n2 + 2 * n1 * n1 * n2)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=_interpret(),
        compiler_params=None if _interpret() else _compiler_params(),
        cost_estimate=pl.CostEstimate(
            flops=2 * (inner_flops * f0 + 8 * f0 * f0 * n1 * n2) * b * h,
            bytes_accessed=(b * h * f0 * n1 * n2) * (8 if need_y else 6)
            * (2 if complex_io else 1),
            transcendentals=0,
        ),
    )(*inputs)
    if gated:
        du5, dpre5, dpost5, dkr, dki = outs
        return du5, dpre5, dpost5, dkr, dki
    if complex_io:
        if need_y:
            du5, du5i, y5, y5i, dkr, dki = outs
        else:
            (du5, du5i, dkr, dki), y5, y5i = outs, None, None
        return du5, du5i, y5, y5i, dkr, dki
    if need_y:
        du5, y5, dkr, dki = outs
    else:
        (du5, dkr, dki), y5 = outs, None
    return du5, y5, dkr, dki


def _finish_dk(plan, dk_re, dk_im, k, half=False):
    """(H, *factor axes) accumulated spectrum cotangent -> dk (H, k_len).

    Inverse transform via the Monarch iDFT: fused Pallas kernels for long
    (>=3-factor) plans, f32 XLA einsums otherwise (XLA's FFT op is far too
    slow on TPU; see monarch_xla.kernel_spectrum). half=True: dk_re/dk_im
    hold only the lower outer bands (dk is real, so they suffice)."""
    if (
        len(plan.factors) >= 3
        and dk_re.ndim == len(plan.factors) + 1
        and (half or not _interpret())
    ):
        dk_t = _inverse_long_dft(plan, dk_re, dk_im, half=half)
    else:
        assert not half
        dk_t, _ = monarch_xla.monarch_idft(
            plan, dk_re, dk_im, compute_dtype=jnp.float32
        )
    return dk_t[..., : k.shape[-1]].astype(k.dtype)


def _gate_finish(plan, u, pregate, postgate, dout, du_inner, y_inner):
    """du/dpre/dpost from the raw correlation output and the recomputed y."""
    if pregate is None:
        du, dpre = du_inner.astype(u.dtype), None
    else:
        du = (du_inner * pregate.astype(jnp.float32)).astype(u.dtype)
        dpre = (du_inner * u.astype(jnp.float32)).astype(pregate.dtype)
    dpost = (
        None
        if postgate is None
        else (y_inner * dout.astype(jnp.float32)).astype(postgate.dtype)
    )
    return du, dpre, dpost


def _long_bwd_fused(plan, u, k, pregate, postgate, dout, ug, g):
    """3-factor (64K-256K) backward as ONE fused kernel (_long_bwd_kernel):
    du, the recomputed y, and the grid-accumulated dk_f in a single HBM
    round trip — the backward twin of the fused forward _long_kernel."""
    length = u.shape[-1]
    f0, n1, n2 = plan.factors
    n = plan.seqlen
    io = _io_dtype(plan, u.dtype)
    kf_re, kf_im = _kernel_spectrum(plan, k, half=True)
    kfc_re, kfc_im = _kf_cast(plan, kf_re, kf_im)

    def shape_in(v):
        v = v.astype(io)
        if length < n:
            v = jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(0, n - length)])
        return v.reshape(v.shape[0], v.shape[1], f0, n1, n2)

    b, h = u.shape[:2]
    # Gate fusion doubles the kernel's I/O windows (4 input + 3 output rows,
    # double-buffered); at N = 2M that alone busts the 128 MB physical VMEM
    # (measured 136.91M, .r5logs/bwd_fori_aot.log). Past the cap the gates
    # run as XLA elementwise passes around the plain fused kernel instead
    # (~4 extra HBM passes, <1 ms at 2M — vs not compiling at all).
    if pregate is not None and n <= _GATED_BWD_MAX:
        # Gate-fused variant: raw u/pre/dout/post in, du/dpre/dpost out —
        # no XLA passes to form ug/g or to apply the gate products.
        du5, dpre5, dpost5, dkr, dki = _long_bwd_tiles(
            shape_in(u), shape_in(dout), kfc_re, kfc_im,
            _outer_tables_half(plan), _tables(plan, base=1),
            factors=plan.factors, compute_dtype=plan.compute_dtype_name,
            io_dtype=io, need_y=True, gated=True,
            pre5=shape_in(pregate), post5=shape_in(postgate),
        )

        def shape_out(v5, dtype):
            return v5.reshape(b, h, n)[..., :length].astype(dtype)

        dk = _finish_dk(plan, dkr, dki, k, half=True)
        return (
            shape_out(du5, u.dtype), dk,
            shape_out(dpre5, pregate.dtype), shape_out(dpost5, postgate.dtype),
        )

    du5, y5, dkr, dki = _long_bwd_tiles(
        shape_in(ug), shape_in(g), kfc_re, kfc_im,
        _outer_tables_half(plan), _tables(plan, base=1),
        factors=plan.factors, compute_dtype=plan.compute_dtype_name,
        io_dtype=io, need_y=postgate is not None,
    )
    # f32 only when a gate product consumes du (dpre = du*u); ungated, the
    # f32 round trip is a pure 2x-memory copy of a (B, H, N) tensor.
    du_inner = du5.reshape(b, h, n)[..., :length]
    if pregate is not None:
        du_inner = du_inner.astype(jnp.float32)
    y_inner = (
        None if y5 is None
        else y5.reshape(b, h, n)[..., :length].astype(jnp.float32)
    )
    dk = _finish_dk(plan, dkr, dki, k, half=True)
    du, dpre, dpost = _gate_finish(plan, u, pregate, postgate, dout,
                                   du_inner, y_inner)
    return du, dk, dpre, dpost


def _long4_bwd_fused(plan, u, k, pregate, postgate, dout, ug, g):
    """4-factor (512K-4M) backward: outer Pallas butterfly on ug and g
    (half f00 bands, bf16 rows), ONE fused complex inner backward kernel
    over factors 1..3 (du rows + recomputed-y rows + grid-accumulated dk_f
    in a single HBM round trip), then inverse outer butterflies for du / y.
    The backward twin of the forward's butterfly + _long_tiles(complex) +
    inverse-butterfly pipeline: it eliminates the HBM-resident full spectra
    and the separate product passes the spectrum-reuse backward pays for
    (the remaining analog of the reference's re-run-the-pipeline >=64K
    backward, /root/reference/flashfftconv/conv.py:1867-3233)."""
    length = u.shape[-1]
    f00, f0, n1, n2 = plan.factors
    n = plan.seqlen
    r = n // f00
    rt = r // 128
    io = _io_dtype(plan, u.dtype)
    b, h = u.shape[:2]
    fb = _half_bands(f00)
    kf_re, kf_im = _kernel_spectrum(plan, k, half=True)  # (h, fb, f0, n1, n2)
    kfc_re, kfc_im = _kf_cast(plan, kf_re, kf_im)

    w0r = plan.tw_re[0].reshape(f00, rt, 128)
    w0i = plan.tw_im[0].reshape(f00, rt, 128)

    def shape_in(v):
        v = v.astype(io)
        if length < n:
            v = jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(0, n - length)])
        return v.reshape(v.shape[0], v.shape[1], f00, rt, 128)

    def fwd_butterfly(x):
        return _butterfly_tiles(
            shape_in(x), None,
            plan.dft_re[0][:fb], plan.dft_im[0][:fb], w0r[:fb], w0i[:fb],
            compute_dtype=plan.compute_dtype, io_dtype=io,
            packed=False, inverse=False,
        )

    ubr, ubi = fwd_butterfly(ug)  # (b, h, fb, rt, 128)
    gbr, gbi = fwd_butterfly(g)

    def rows(v):
        return v.reshape(b, h * fb, f0, n1, n2)

    du5, du5i, y5, y5i, dkr, dki = _long_bwd_tiles(
        rows(ubr), rows(gbr),
        kfc_re.reshape(h * fb, f0, n1, n2),
        kfc_im.reshape(h * fb, f0, n1, n2),
        _outer_tables(plan, base=1), _tables(plan, base=2),
        factors=plan.factors[1:], compute_dtype=plan.compute_dtype_name,
        io_dtype=io, need_y=postgate is not None,
        ug5_im=rows(ubi), g5_im=rows(gbi),
    )

    wts = jnp.asarray(_half_weights(f00))
    bic0r = plan.idft_re[0][:, :fb] * wts
    bic0i = plan.idft_im[0][:, :fb] * wts

    def inv_butterfly(zre, zim, out_dtype=jnp.float32):
        o, _ = _butterfly_tiles(
            zre.reshape(b, h, fb, rt, 128), zim.reshape(b, h, fb, rt, 128),
            bic0r, bic0i, w0r[:fb], w0i[:fb],
            compute_dtype=plan.compute_dtype, io_dtype=out_dtype,
            packed=False, inverse=True,
        )
        return o.reshape(b, h, n)[..., :length]

    # du stays at the HBM io dtype unless a gate product consumes it in f32
    # (dpre = du*u); ungated, the f32 butterfly output doubles a (B, H, N)
    # HBM temp for nothing.
    du_inner = inv_butterfly(du5, du5i,
                             out_dtype=jnp.float32 if pregate is not None
                             else io)
    y_inner = None if y5 is None else inv_butterfly(y5, y5i)
    dk = _finish_dk(plan, dkr.reshape(h, fb, f0, n1, n2),
                    dki.reshape(h, fb, f0, n1, n2), k, half=True)
    du, dpre, dpost = _gate_finish(plan, u, pregate, postgate, dout,
                                   du_inner, y_inner)
    return du, dk, dpre, dpost


# Backward-only factorization overrides. The fused backward's live VMEM set
# is ~2x the forward's at the same factors (two spectra Ug/G + the dk
# accumulation block on top of the signal tiles), so the forward-optimal
# factorization can sit past the backward's VMEM sweet spot: at 1M the
# (8,512,256) plan has the fastest measured forward (6.4 ms plain, MFU
# 0.365, results_v5e_r4_final.csv) but a 22.3 ms backward, while the sweep
# measured (16,512,128)'s backward at ~16.5 ms (tpu_factor_sweep.json,
# fwd_bwd - fwd). Correctness is factorization-independent — du and dk
# leave the kernel in the time domain — so the backward may use its own
# plan. Entries land here only after an on-chip sweep validates them;
# FLASHFFTCONV_BWD_FACTORS="N:f0,n1,n2[;N:...]" overrides for A/B.
_BWD_FACTORS_DEFAULT: dict[int, tuple[int, ...]] = {}


@functools.lru_cache(maxsize=32)
def _bwd_plan_cached(seqlen: int, compute_dtype_name: str,
                     factors: tuple[int, ...]):
    from flashfftconv_tpu.ops.plan import make_plan

    return make_plan(seqlen, compute_dtype=jnp.dtype(compute_dtype_name),
                     factors=factors)


def _bwd_plan(plan):
    """The plan the fused >=64K backward should run under (see
    _BWD_FACTORS_DEFAULT); falls back to the forward plan unless the
    override exists, differs, and passes the `supported` VMEM gates."""
    table = dict(_BWD_FACTORS_DEFAULT)
    for item in os.environ.get("FLASHFFTCONV_BWD_FACTORS", "").split(";"):
        if ":" not in item:
            continue
        n_s, f_s = item.split(":", 1)
        try:
            n_val = int(n_s)
            facs = tuple(int(x) for x in f_s.split(","))
        except ValueError as e:
            raise ValueError(
                f"FLASHFFTCONV_BWD_FACTORS: cannot parse item {item!r} "
                "(expected 'N:f0,f1,...[;N:...]')"
            ) from e
        prod = 1
        for x in facs:
            prod *= x
        if prod != n_val:
            raise ValueError(
                f"FLASHFFTCONV_BWD_FACTORS: factors {facs} multiply to "
                f"{prod}, not {n_val} (item {item!r})"
            )
        table[n_val] = facs
    f = table.get(plan.seqlen)
    if not f or tuple(f) == tuple(plan.factors):
        return plan
    p2 = _bwd_plan_cached(plan.seqlen, plan.compute_dtype_name, tuple(f))
    return p2 if len(p2.factors) in (3, 4) and supported(p2) else plan


def _long_bwd_spectrum_reuse(plan, u, k, pregate, postgate, dout, ug, g):
    """Backward for long (3/4-factor, >=64K) plans with forward-spectrum
    reuse: ONE forward DFT each of ug = pre*u and g = post*dout serves all
    three outputs — du = iFFT(G * conj(K_f)), the recomputed y = iFFT(Ug *
    K_f) for dpostgate, and dk_f = sum_B G * conj(Ug) — instead of running
    two full convolutions plus two DFTs (which recompute FFT(g)/FFT(ug)
    inside). With the half-band (rfft) tables the per-row cost is 2 half
    forward + <=2 half inverse transforms, i.e. a fwd:bwd transform-work
    ratio of 1:2 gated / 1:1.5 ungated, vs 1:3 for the recompute-everything
    layout (the reference's ">=64K backward re-runs the 3-stage pipeline"
    scheme, /root/reference/flashfftconv/conv.py:1867-3233). On TPU this
    path only serves 2-D (rows) inputs: 3-factor plans take the fully-fused
    single-kernel backward (_long_bwd_fused) and 4-factor plans the
    butterfly + fused-complex-inner pipeline (_long4_bwd_fused)."""
    if len(plan.factors) in (3, 4) and u.ndim == 3 and not _interpret():
        bplan = _bwd_plan(plan)
        if len(bplan.factors) == 3:
            return _long_bwd_fused(bplan, u, k, pregate, postgate, dout, ug, g)
        return _long4_bwd_fused(bplan, u, k, pregate, postgate, dout, ug, g)
    length = u.shape[-1]
    bh = u.shape[:-1]
    half = not _interpret()
    kf_re, kf_im = _kernel_spectrum(plan, k, half=half)

    # Spectrum I/O dtype: the Pallas long-DFT stages emit the plan compute
    # dtype (bf16) — keeping the HBM-resident spectra there (instead of the
    # old eager f32 upcast) removes a full-tensor convert pass and halves
    # the traffic of every product below; products upcast to f32 in-register
    # (XLA fuses the converts into the elementwise loops) and dk accumulates
    # in f32. du/y then ride the same bf16 pipeline as the forward output,
    # whose 1e-2 parity is hardware-verified (benchmarks/tpu_parity.json).
    f32 = jnp.float32

    def fwd_rows(x):
        x2 = x.reshape(-1, length)
        if half:
            return _forward_long_dft(plan, x2.astype(f32), half=True)
        x2 = x2.astype(f32)
        if length < plan.seqlen:
            x2 = jnp.pad(x2, ((0, 0), (0, plan.seqlen - length)))
        r, i = monarch_xla.monarch_dft(plan, x2)
        return r.astype(f32), i.astype(f32)

    def inv_rows(r, i):
        """Planar Monarch spectrum rows -> real (C, length) signal."""
        if half:
            o = _inverse_long_dft(plan, r, i, half=True)
        else:
            o, _ = monarch_xla.monarch_idft(plan, r, i)
        return o[..., :length].astype(f32)

    ur, ui = fwd_rows(ug)
    gr, gi = fwd_rows(g)
    fshape = ur.shape[1:]
    spec_io = ur.dtype

    # dk_f = sum over batch of G * conj(Ug)  (per-channel outer product).
    dk_re = (gr.astype(f32) * ur.astype(f32)
             + gi.astype(f32) * ui.astype(f32)).reshape(bh + fshape)
    dk_im = (gi.astype(f32) * ur.astype(f32)
             - gr.astype(f32) * ui.astype(f32)).reshape(bh + fshape)
    sum_axes = tuple(range(len(bh) - 1))
    dk = _finish_dk(plan, dk_re.sum(sum_axes), dk_im.sum(sum_axes), k, half=half)

    # du = iFFT(G * conj(K_f)); K_f broadcasts over the batch dims.
    kr = kf_re.astype(f32)
    ki = kf_im.astype(f32)
    if len(bh) == 2:
        kb_r = jnp.broadcast_to(kr[None], bh + fshape).reshape((-1,) + fshape)
        kb_i = jnp.broadcast_to(ki[None], bh + fshape).reshape((-1,) + fshape)
    else:
        kb_r, kb_i = kr, ki
    du_inner = inv_rows(
        (gr.astype(f32) * kb_r + gi.astype(f32) * kb_i).astype(spec_io),
        (gi.astype(f32) * kb_r - gr.astype(f32) * kb_i).astype(spec_io),
    ).reshape(bh + (length,))
    if pregate is None:
        du, dpre = du_inner.astype(u.dtype), None
    else:
        du = (du_inner * pregate.astype(jnp.float32)).astype(u.dtype)
        dpre = (du_inner * u.astype(jnp.float32)).astype(pregate.dtype)

    if postgate is None:
        dpost = None
    else:
        # y (without postgate) = iFFT(Ug * K_f), reusing Ug.
        y_inner = inv_rows(
            (ur.astype(f32) * kb_r - ui.astype(f32) * kb_i).astype(spec_io),
            (ur.astype(f32) * kb_i + ui.astype(f32) * kb_r).astype(spec_io),
        ).reshape(bh + (length,))
        dpost = (y_inner * dout.astype(jnp.float32)).astype(postgate.dtype)
    return du, dk, dpre, dpost


def _gated_bwd(plan_key, res, dout):
    plan = _PLAN_REGISTRY[plan_key]
    u, k, pregate, postgate = res
    length = u.shape[-1]

    g = dout if postgate is None else dout * postgate
    ug = u if pregate is None else u * pregate

    if len(plan.factors) >= 3 and u.ndim in (2, 3):
        return _long_bwd_spectrum_reuse(plan, u, k, pregate, postgate, dout, ug, g)

    kf_re, kf_im = _kernel_spectrum(plan, k, half=_use_half(plan, u))
    kfc_re, kfc_im = _kf_cast(plan, kf_re, kf_im)

    if (
        len(plan.factors) == 1
        and u.ndim == 3
        and length % 128 == 0
        and u.shape[0] % 2 == 0
    ):
        ht = next((t for t in (64, 32, 16, 8) if u.shape[1] % t == 0), None)
        if ht is not None:
            # Fused direct-DFT backward (the 1-factor twin of the 2-factor
            # fused-I/O backward): one HBM round trip for du/dpre/dpost +
            # grid-accumulated dk_f, tables sliced for L < N as in the
            # forward.
            io = _io_dtype(plan, u.dtype)
            cd = plan.compute_dtype
            cre = plan.dft_re[0][:length].astype(cd)
            cim = plan.dft_im[0][:length].astype(cd)
            icre = plan.idft_re[0][:, :length].astype(cd)
            icim = plan.idft_im[0][:, :length].astype(cd)
            if pregate is not None:
                du4, dpre4, dpost4, dkr, dki = _direct_bwd_fused_io_tiles(
                    u.astype(io), dout.astype(io), kf_re, kf_im,
                    cre, cim, icre, icim, seqlen=plan.seqlen,
                    compute_dtype=plan.compute_dtype_name, need_y=True,
                    ht=ht, gated=True,
                    pre=pregate.astype(io), post=postgate.astype(io),
                )
                dk = _finish_dk(plan, dkr, dki, k)
                return (
                    du4.astype(u.dtype), dk,
                    dpre4.astype(pregate.dtype),
                    dpost4.astype(postgate.dtype),
                )
            du4, y4, dkr, dki = _direct_bwd_fused_io_tiles(
                ug.astype(io), g.astype(io), kf_re, kf_im,
                cre, cim, icre, icim, seqlen=plan.seqlen,
                compute_dtype=plan.compute_dtype_name,
                need_y=postgate is not None, ht=ht,
            )
            dk = _finish_dk(plan, dkr, dki, k)
            du_inner = (du4.astype(jnp.float32) if pregate is not None
                        else du4)
            y_inner = None if y4 is None else y4.astype(jnp.float32)
            du, dpre, dpost = _gate_finish(plan, u, pregate, postgate, dout,
                                           du_inner, y_inner)
            return du, dk, dpre, dpost

    small_n1 = plan.factors[0] < 16
    if (
        len(plan.factors) == 2
        and u.ndim == 3
        and not (small_n1 and (_h_tile(*plan.factors, u.shape[1]) is None
                               or length % plan.factors[1]))
    ):
        # Fused backward kernel: one pass computes du, the recomputed y (for
        # dpostgate) and the grid-accumulated dk_f partials.
        io = _io_dtype(plan, u.dtype)
        ht = _h_tile(*plan.factors, u.shape[1])
        if ht is not None and length % plan.factors[1] == 0:
            if pregate is not None:
                # Gate-fused: raw u/pre/dout/post in, du/dpre/dpost out —
                # no XLA passes to form ug/g or apply the gate products.
                du4, dpre4, dpost4, dkr, dki = _bwd_fused_io_tiles(
                    u.astype(io),
                    dout.astype(io),
                    kfc_re,
                    kfc_im,
                    _tables(plan),
                    plan_factors=plan.factors,
                    seqlen=plan.seqlen,
                    compute_dtype=plan.compute_dtype_name,
                    need_y=True,
                    ht=ht,
                    gated=True,
                    pre=pregate.astype(io),
                    post=postgate.astype(io),
                )
                dk = _finish_dk(plan, dkr, dki, k)
                return (
                    du4.astype(u.dtype), dk,
                    dpre4.astype(pregate.dtype), dpost4.astype(postgate.dtype),
                )
            du4, y4, dkr, dki = _bwd_fused_io_tiles(
                ug.astype(io),
                g.astype(io),
                kfc_re,
                kfc_im,
                _tables(plan),
                plan_factors=plan.factors,
                seqlen=plan.seqlen,
                compute_dtype=plan.compute_dtype_name,
                need_y=postgate is not None,
                ht=ht,
            )
            du_inner = du4.astype(jnp.float32)
            y_inner = None if y4 is None else y4.astype(jnp.float32)
        else:
            u4 = _layout(plan, ug, dtype=io)
            g4 = _layout(plan, g, dtype=io)
            du4, y4, dkr, dki = _bwd_tiles(
                u4,
                g4,
                kfc_re,
                kfc_im,
                _tables(plan),
                plan_factors=plan.factors,
                compute_dtype=plan.compute_dtype_name,
                need_y=postgate is not None,
                io_dtype=io,
            )
            du_inner = _unlayout(plan, du4, length).astype(jnp.float32)
            y_inner = (
                None if y4 is None else _unlayout(plan, y4, length).astype(jnp.float32)
            )
        dk = _finish_dk(plan, dkr, dki, k)
        if pregate is None:
            du, dpre = du_inner.astype(u.dtype), None
        else:
            du = (du_inner * pregate.astype(jnp.float32)).astype(u.dtype)
            dpre = (du_inner * u.astype(jnp.float32)).astype(pregate.dtype)
        if postgate is None:
            dpost = None
        else:
            dpost = (y_inner * dout.astype(jnp.float32)).astype(postgate.dtype)
        return du, dk, dpre, dpost

    # General path (odd 2-factor shapes, direct plans): du via correlation
    # conv, dk via the XLA Monarch transforms.
    du_inner = _conv_raw(plan, g, kf_re, -kf_im, None, None, jnp.float32)
    if pregate is None:
        du = du_inner.astype(u.dtype)
        dpre = None
    else:
        du = (du_inner * pregate.astype(jnp.float32)).astype(u.dtype)
        dpre = (du_inner * u.astype(jnp.float32)).astype(pregate.dtype)

    if postgate is None:
        dpost = None
    else:
        y_inner = _conv_raw(plan, u, kf_re, kf_im, pregate, None, jnp.float32)
        dpost = (y_inner * dout.astype(jnp.float32)).astype(postgate.dtype)

    def _pad_full(x):
        x = x.astype(jnp.float32)
        if x.shape[-1] < plan.seqlen:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, plan.seqlen - x.shape[-1])]
            x = jnp.pad(x, pad)
        return x

    ur, ui = monarch_xla.monarch_dft(plan, _pad_full(ug))
    gr, gi = monarch_xla.monarch_dft(plan, _pad_full(g))
    dk_re = gr * ur + gi * ui
    dk_im = gi * ur - gr * ui
    sum_axes = tuple(range(dk_re.ndim - 1 - len(plan.factors)))
    dk = _finish_dk(plan, dk_re.sum(sum_axes), dk_im.sum(sum_axes), k)
    return du, dk, dpre, dpost


_fft_conv_pallas_gated.defvjp(_gated_fwd, _gated_bwd)

# custom_vjp needs hashable static plan identity; plans are registered by
# (seqlen, compute_dtype) and the arrays live here (shared, built once).
_PLAN_REGISTRY: dict = {}


def _register(plan: FftPlan):
    key = (plan.seqlen, plan.factors, plan.compute_dtype_name)
    _PLAN_REGISTRY.setdefault(key, plan)
    return key


def fft_conv_pallas(plan, u, k, pregate=None, postgate=None):
    """Fused-kernel FFT conv (custom VJP). Falls back assertion-free: caller
    (dispatch.resolve_impl) guarantees supported(plan)."""
    key = _register(plan)
    if pregate is None:
        # Share one custom_vjp; None gates are represented as zeros-free path
        # by passing literal None through a wrapper that closes over it.
        return _fft_conv_pallas_ungated(key, u, k)
    return _fft_conv_pallas_gated(key, u, k, pregate, postgate)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fft_conv_pallas_ungated(plan_key, u, k):
    plan = _PLAN_REGISTRY[plan_key]
    kf_re, kf_im = _kernel_spectrum(plan, k, half=_use_half(plan, u))
    return _conv_raw(plan, u, kf_re, kf_im, None, None, u.dtype)


def _ungated_fwd(plan_key, u, k):
    return _fft_conv_pallas_ungated(plan_key, u, k), (u, k)


def _ungated_bwd(plan_key, res, dout):
    u, k = res
    du, dk, _, _ = _gated_bwd(plan_key, (u, k, None, None), dout)
    return du, dk


_fft_conv_pallas_ungated.defvjp(_ungated_fwd, _ungated_bwd)
