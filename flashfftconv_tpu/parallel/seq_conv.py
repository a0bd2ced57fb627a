"""Sequence-sharded FFT convolution over a device mesh (context parallelism).

The reference handles long sequences strictly on a single device — its 3-stage
butterfly pipeline tops out at the 4M elements that fit one GPU's HBM, and its
Megatron-style sequence parallelism shards only *pointwise* blocks, never the
convolution itself (/root/reference SURVEY.md §2.6, §5.7: "the conv is never
sequence-sharded"). This module goes past that: the Monarch/four-step FFT
factorization *is* a distributed algorithm. Write N = P * N2 with P = the mesh
axis size; then

  FFT_N(x)[m2*P + m1] = DFT_{N2, n2->m2}( W_N^{m1*n2} * DFT_{P, n1->m1}(x[n1*N2+n2]) )

The chunk axis n1 is the device axis: the P-point outer DFT mixes *across*
devices (two `all_to_all`s — the classic distributed-FFT transpose), the
twiddle and the length-N2 inner transforms are device-local Monarch matmul
chains (`ops/monarch_xla.py`), and the frequency-domain kernel multiply is
pointwise in each device's band m1. A circular conv at size N = scatter,
outer DFT, twiddle, per-band length-N2 conv against the kernel's band
spectrum, conjugate twiddle, outer IDFT, gather — 3 all_to_alls for the
activations + 2 for the kernel, everything else local MXU work.

This shards the *sequence* itself: a mesh of 8 chips runs one 32M-point
convolution (8 x 4M), with HBM per chip holding only the 1/P chunk. Gates
(pregate/postgate) are pointwise in the time domain and stay local.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from flashfftconv_tpu.ops import monarch_pallas
from flashfftconv_tpu.ops.monarch_xla import monarch_dft, monarch_idft
from flashfftconv_tpu.ops.plan import make_plan


def _outer_dft_matrices(p: int):
    """(W_re, W_im, Winv_re, Winv_im): the P-point DFT across chunks and its
    inverse (1/P folded in), f32, exact integer-mod phases."""
    idx = np.arange(p, dtype=np.int64)
    ph = (idx[:, None] * idx[None, :]) % p
    ang = -2.0 * np.pi * ph / p
    w_re = np.cos(ang, dtype=np.float64).astype(np.float32)
    w_im = np.sin(ang, dtype=np.float64).astype(np.float32)
    return (
        jnp.asarray(w_re),
        jnp.asarray(w_im),
        jnp.asarray(w_re.T / p),
        jnp.asarray(-w_im.T / p),
    )


def _outer_mm(w_re, w_im, xre, xim):
    """Complex matmul along axis -2 (the chunk/band axis): x (..., P, Q)."""
    mm = functools.partial(
        jnp.einsum, "mn,...nq->...mq", preferred_element_type=jnp.float32
    )
    if xim is None:
        return mm(w_re, xre), mm(w_im, xre)
    return (
        mm(w_re, xre) - mm(w_im, xim),
        mm(w_re, xim) + mm(w_im, xre),
    )


def _twiddle(p, q, n, e, conj):
    """W_N^{m1 * n2} for m1 in [0, P), n2 = e*Q + j, j in [0, Q): (P, Q) planar.

    Phases are exact int32 products reduced mod N (m1 * n2 < N <= 2^31), like
    the plan's integer-mod tables (ops/plan.py); the angle division is the
    only rounding.
    """
    m1 = jnp.arange(p, dtype=jnp.int32)[:, None]
    n2 = (e * q + jnp.arange(q, dtype=jnp.int32))[None, :]
    ph = (m1 * n2) % n
    ang = (-2.0 * jnp.pi / n) * ph.astype(jnp.float32)
    tre = jnp.cos(ang)
    tim = jnp.sin(ang)
    return tre, -tim if conj else tim


def _cmul(xre, xim, wre, wim):
    if xim is None:
        return xre * wre, xre * wim
    return xre * wre - xim * wim, xre * wim + xim * wre


def _scatter(x, axis_name, p):
    """(..., N2) -> (..., P, Q) with axis -2 indexing the *source* device:
    the distributed-FFT transpose. On entry every device holds one chunk/band
    along the sharded sequence; on exit it holds all chunks' (or bands')
    j-block e, e = this device."""
    q = x.shape[-1] // p
    x = x.reshape(*x.shape[:-1], p, q)
    ax = x.ndim - 2
    return lax.all_to_all(x, axis_name, split_axis=ax, concat_axis=ax, tiled=True)


def _gather(x, axis_name):
    """(..., P, Q) with axis -2 the chunk/band index -> (..., N2): device d
    ends up holding the full-length row d (inverse of _scatter's layout)."""
    ax = x.ndim - 2
    out = lax.all_to_all(
        x, axis_name, split_axis=ax, concat_axis=x.ndim - 1, tiled=True
    )
    return out.reshape(*out.shape[: ax], out.shape[-1])


def _pallas_band_ok(plan2) -> bool:
    """Can the device-local band conv run as a fused Pallas kernel?

    2-factor plans (N2 <= 32K) use the fused complex-I/O tile kernel; 3-factor
    plans (N2 64K-256K) use the fused long kernel with complex I/O — the same
    kernels the single-chip >=64K path composes, here running *inside*
    shard_map so each device's Monarch band conv is one HBM round trip instead
    of the XLA einsum chain's per-stage planar intermediates.
    """
    return len(plan2.factors) in (2, 3) and monarch_pallas.supported(plan2)


def _band_conv_pallas_raw(plan2, bre, bim, kf_re, kf_im):
    """Fused per-band conv: iDFT_N2(DFT_N2(b) * kf), complex planar I/O.

    bre/bim: (..., H, N2) f32 band signal; kf: this device's band of the
    kernel spectrum in Monarch layout ((H, n1, n2) or (H, f0, n1, n2)).
    Equivalent to monarch_dft -> pointwise kf multiply -> monarch_idft
    (the 1/N2 normalization rides in plan2.idft[0] either way).
    """
    io = monarch_pallas._io_dtype(plan2, jnp.bfloat16)
    kf_re, kf_im = monarch_pallas._kf_cast(plan2, kf_re, kf_im)
    lead = bre.shape[:-2]
    h, n2len = bre.shape[-2], bre.shape[-1]
    bre = bre.reshape(-1, h, n2len)
    bim = bim.reshape(-1, h, n2len)
    if len(plan2.factors) == 2:
        u4re = monarch_pallas._layout(plan2, bre, dtype=io)
        u4im = monarch_pallas._layout(plan2, bim, dtype=io)
        ore, oim = monarch_pallas._conv_tiles(
            u4re, u4im, kf_re, kf_im,
            monarch_pallas._tables(plan2),
            plan_factors=plan2.factors,
            compute_dtype=plan2.compute_dtype_name,
            complex_out=True,
            out_dtype=jnp.float32,
        )
        ore = monarch_pallas._unlayout(plan2, ore, n2len)
        oim = monarch_pallas._unlayout(plan2, oim, n2len)
    else:
        f0, n1, n2 = plan2.factors
        x5re = bre.reshape(bre.shape[0], h, f0, n1, n2).astype(io)
        x5im = bim.reshape(bim.shape[0], h, f0, n1, n2).astype(io)
        ore, oim = monarch_pallas._long_tiles(
            x5re, x5im, kf_re, kf_im,
            monarch_pallas._outer_tables(plan2),
            monarch_pallas._tables(plan2, base=1),
            factors=plan2.factors,
            compute_dtype=plan2.compute_dtype_name,
            io_dtype=jnp.float32,
            packed=False,
            complex_io=True,
        )
        ore = ore.reshape(ore.shape[0], h, n2len)
        oim = oim.reshape(oim.shape[0], h, n2len)
    return (
        ore.astype(jnp.float32).reshape(*lead, h, n2len),
        oim.astype(jnp.float32).reshape(*lead, h, n2len),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _band_conv_pallas(plan_key, bre, bim, kf_re, kf_im):
    """custom_vjp wrapper: pallas_call has no autodiff rule, but the band conv
    is complex-linear — M = F^-1 diag(kf) F, so M^H is the band conv with
    conj(kf), and dkf = conj(F b) * (F dy) / N2 (the planar-real Jacobian
    transpose of a complex-linear map is the conjugate-transpose operator)."""
    plan2 = monarch_pallas._PLAN_REGISTRY[plan_key]
    return _band_conv_pallas_raw(plan2, bre, bim, kf_re, kf_im)


def _band_conv_fwd(plan_key, bre, bim, kf_re, kf_im):
    out = _band_conv_pallas(plan_key, bre, bim, kf_re, kf_im)
    return out, (bre, bim, kf_re, kf_im)


def _band_conv_bwd(plan_key, res, cot):
    plan2 = monarch_pallas._PLAN_REGISTRY[plan_key]
    bre, bim, kf_re, kf_im = res
    dyre, dyim = cot
    dbre, dbim = _band_conv_pallas_raw(plan2, dyre, dyim, kf_re, -kf_im)
    xf_re, xf_im = monarch_dft(plan2, bre, bim)
    gf_re, gf_im = monarch_dft(plan2, dyre, dyim)
    inv_n = jnp.float32(1.0 / plan2.seqlen)
    dkf_re = (xf_re * gf_re + xf_im * gf_im) * inv_n
    dkf_im = (xf_re * gf_im - xf_im * gf_re) * inv_n
    extra = dkf_re.ndim - kf_re.ndim
    if extra:
        axes = tuple(range(extra))
        dkf_re = dkf_re.sum(axis=axes)
        dkf_im = dkf_im.sum(axis=axes)
    return (
        dbre.astype(bre.dtype),
        dbim.astype(bim.dtype),
        dkf_re.astype(kf_re.dtype),
        dkf_im.astype(kf_im.dtype),
    )


_band_conv_pallas.defvjp(_band_conv_fwd, _band_conv_bwd)


def _band_spectrum(k_loc, plan2, axis_name, p, q, n, e, w_re, w_im):
    """This device's band m1=e of the kernel's N-point spectrum, in the inner
    plan's Monarch layout: run the kernel chunk through the same scatter ->
    outer DFT -> twiddle -> gather -> inner DFT pipeline as the input."""
    ks = _scatter(k_loc.astype(jnp.float32), axis_name, p)
    kre, kim = _outer_mm(w_re, w_im, ks, None)
    tre, tim = _twiddle(p, q, n, e, conj=False)
    kre, kim = _cmul(kre, kim, tre, tim)
    kre, kim = _gather(kre, axis_name), _gather(kim, axis_name)
    return monarch_dft(plan2, kre, kim)


def seq_fft_conv(
    u: jax.Array,
    k: jax.Array,
    mesh: Mesh,
    axis: str = "sp",
    pregate: jax.Array | None = None,
    postgate: jax.Array | None = None,
    compute_dtype=jnp.bfloat16,
    impl: str = "auto",
) -> jax.Array:
    """Circular FFT conv of size N with the sequence sharded over `mesh[axis]`.

    Semantics match ``fft_conv`` at L == N:
    ``out = postgate * ifft(fft(pregate * u) * fft(k)).real`` — but u, k and
    the gates live sharded along their last axis and no device ever
    materializes the full sequence. Fully differentiable (the all_to_all
    transposes are their own adjoints up to index reversal, handled by AD).

    Args:
      u: (..., H, N) real input; sharded (or shardable) along the last axis.
      k: (H, N) real kernel, full length (pad shorter kernels before
        sharding — padding is position-dependent, so it is the caller's
        side of the contract here, unlike the single-chip path).
      mesh: mesh whose `axis` axis (size P) carries the sequence. N % P == 0,
        N/P a power of two >= 16, and (N/P) % P == 0.
      pregate/postgate: optional (..., H, N) gates, sharded like u.
      impl: 'auto' | 'xla' | 'pallas' for the device-local band conv.
        'pallas' fuses each device's inner Monarch conv (DFT_N2 * kf * iDFT)
        into one kernel inside shard_map; 'xla' keeps the einsum chain;
        'auto' picks Pallas whenever the local plan supports it.

    Returns:
      (..., H, N) real conv output, sharded like u.
    """
    n = u.shape[-1]
    p = mesh.shape[axis]
    if k.shape[-1] != n:
        raise ValueError(f"kernel length {k.shape[-1]} != seqlen {n}; pad first")
    if n % p != 0 or (n // p) % p != 0:
        raise ValueError(f"seqlen {n} not tileable over {p} devices")
    n2 = n // p
    if n2 & (n2 - 1) or n2 < 16:
        raise ValueError(f"per-device length {n2} must be a power of two >= 16")
    q = n2 // p
    plan2 = make_plan(n2, compute_dtype=compute_dtype)
    if len(plan2.factors) == 1:
        # DIRECT_MAX makes small seqlens single-factor dense-DFT plans (a
        # single-chip latency win); the band conv is built on the 2-factor
        # Monarch structure, so split close-to-square explicitly here.
        f1 = 1 << (n2.bit_length() // 2)
        plan2 = make_plan(n2, compute_dtype=compute_dtype,
                          factors=(max(f1, n2 // f1), min(f1, n2 // f1)))
    w_re, w_im, wi_re, wi_im = _outer_dft_matrices(p)
    out_dtype = u.dtype
    if impl not in ("auto", "xla", "pallas"):
        raise ValueError(f"impl must be auto|xla|pallas, got {impl!r}")
    # auto: fused Pallas band conv on real TPUs; on CPU Pallas only runs in
    # interpret mode (a python-loop emulation), so auto keeps the XLA einsum
    # path there and impl='pallas' opts in explicitly (tests do).
    use_pallas = impl == "pallas" or (
        impl == "auto" and _pallas_band_ok(plan2) and not monarch_pallas._interpret()
    )
    if impl == "pallas" and not _pallas_band_ok(plan2):
        raise ValueError(
            f"impl='pallas' unsupported for per-device length {n2} "
            f"(factors {plan2.factors})"
        )
    plan_key = monarch_pallas._register(plan2) if use_pallas else None

    def local(u_loc, k_loc, pre_loc, post_loc):
        e = lax.axis_index(axis)
        if pre_loc is not None:
            u_loc = u_loc * pre_loc
        xs = _scatter(u_loc.astype(jnp.float32), axis, p)  # (..., P=n1, Q)
        are, aim = _outer_mm(w_re, w_im, xs, None)  # DFT across chunks
        tre, tim = _twiddle(p, q, n, e, conj=False)
        are, aim = _cmul(are, aim, tre, tim)
        bre, bim = _gather(are, axis), _gather(aim, axis)  # band m1=e, full N2

        kf_re, kf_im = _band_spectrum(k_loc, plan2, axis, p, q, n, e, w_re, w_im)
        if use_pallas:
            dre, dim = _band_conv_pallas(plan_key, bre, bim, kf_re, kf_im)
        else:
            xf_re, xf_im = monarch_dft(plan2, bre, bim)
            yf_re = xf_re * kf_re - xf_im * kf_im
            yf_im = xf_re * kf_im + xf_im * kf_re
            dre, dim = monarch_idft(plan2, yf_re, yf_im)  # 1/N2 folded in

        dre, dim = _scatter(dre, axis, p), _scatter(dim, axis, p)  # (..., P=m1, Q)
        cre, cim = _twiddle(p, q, n, e, conj=True)
        dre, dim = _cmul(dre, dim, cre, cim)
        fre, _ = _outer_mm(wi_re, wi_im, dre, dim)  # IDFT across bands (+1/P);
        # the imaginary output is ~0 for real input — dropped before the
        # gather, saving one all_to_all.
        out = _gather(fre, axis)  # chunk n1=e of y
        if post_loc is not None:
            out = out * post_loc.astype(jnp.float32)
        return out.astype(out_dtype)

    nb = u.ndim - 1
    seq_spec = P(*([None] * nb), axis)
    k_spec = P(*([None] * (k.ndim - 1)), axis)
    in_specs = (seq_spec, k_spec, seq_spec if pregate is not None else P(),
                seq_spec if postgate is not None else P())

    def wrapped(u_, k_, pre_, post_):
        return local(
            u_, k_,
            pre_ if pregate is not None else None,
            post_ if postgate is not None else None,
        )

    fn = jax.shard_map(
        wrapped, mesh=mesh, in_specs=in_specs, out_specs=seq_spec,
        # pallas_call emits ShapeDtypeStructs without varying-mesh-axis
        # metadata; the vma check would reject the fused band kernel.
        check_vma=False,
    )
    zero = jnp.zeros((), u.dtype)
    return fn(
        u, k,
        pregate if pregate is not None else zero,
        postgate if postgate is not None else zero,
    )


def seq_fft_conv_padded(
    u: jax.Array,
    k: jax.Array,
    mesh: Mesh,
    seqlen: int | None = None,
    axis: str = "sp",
    pregate: jax.Array | None = None,
    postgate: jax.Array | None = None,
    compute_dtype=jnp.bfloat16,
    impl: str = "auto",
) -> jax.Array:
    """Linear (causal) conv at L < N via zero-padding, sequence-sharded.

    The single-chip kernels zero-pad implicitly inside the kernel
    (`fft_conv(plan, u, k)` with L <= N); here the pad is an explicit GSPMD
    `jnp.pad` on the sharded global array — XLA inserts the resharding so the
    padded tail lands as zero chunks on the trailing devices — followed by the
    circular `seq_fft_conv` at size N and a truncation back to L. This is what
    a long-conv/Hyena layer calls to train at sequence lengths no single chip
    can hold.

    Args:
      u: (..., H, L) real input. seqlen defaults to 2L (the model-layer
        convention for making the circular conv linear).
      k: (H, k_len) real kernel, k_len <= seqlen.
    """
    length = u.shape[-1]
    n = seqlen or 2 * length
    if length > n:
        raise ValueError(f"input length {length} > seqlen {n}")

    def padded(x):
        if x is None or x.shape[-1] == n:
            return x
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])])

    # Gates act on the original L samples only; padding them with zeros
    # matches the single-chip semantics (out beyond L is discarded anyway,
    # and pregate*0-pad keeps the padded region zero).
    out = seq_fft_conv(
        padded(u), padded(k), mesh, axis=axis,
        pregate=padded(pregate), postgate=padded(postgate),
        compute_dtype=compute_dtype, impl=impl,
    )
    return out[..., :length]
