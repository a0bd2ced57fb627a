"""Monarch FFT plans: precomputed DFT matrices, twiddle factors and factorizations.

A length-``N`` FFT (``N`` a power of two, 256 <= N <= 4M) is decomposed into a
chain of small batched matrix multiplies ("Monarch decomposition"): pick factors
``N = f_1 * f_2 * ... * f_m``, reshape the signal to ``(f_1, ..., f_m)`` and
apply, for each stage ``j``, a DFT of size ``f_j`` along axis ``j`` followed by
an elementwise twiddle multiply. Each stage maps onto the TPU MXU as a batched
matmul with contraction dimension ``f_j``.

This mirrors the capability of the reference FlashFFTConv plan construction
(``/root/reference/flashfftconv/conv.py:22-69`` and the per-seqlen buffer setup
at ``conv.py:71-549``) but chooses TPU-native factor sizes: instead of the
CUDA 16x16/32x32 WMMA tiles, we use factors up to 256 so the contraction
dimensions saturate the 128x128 MXU, and we keep all tables in float32 (the
reference stores them in fp16/bf16, which is why its k-grad tolerance degrades
at 4M; see ``/root/reference/tests/test_flashfftconv.py:105-107``).

All twiddle/DFT phases are computed with exact integer arithmetic mod N in
float64 before the final cos/sin, so tables are accurate to f32 roundoff even
at N = 4,194,304.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# The reference supports 256..4M (README.md:268). We additionally allow tiny
# sizes (16..128) through the direct-DFT path so short-context models work.
MIN_SEQLEN = 16
MAX_SEQLEN = 4 * 1024 * 1024

# Largest factor we allow per Monarch stage. 256 keeps the per-stage DFT matrix
# (256x256 complex f32 = 512 KB planar) comfortably in VMEM while giving the MXU
# contraction dims of 128-256.
_MAX_FACTOR = 256
# Largest "inner" FFT handled by a single fused kernel pass; sequences longer
# than this use an outer butterfly stage (three-pass pipeline), like the
# reference's >=64K path (/root/reference/flashfftconv/conv.py:203-549).
MAX_INNER = 32768

# Per-kernel VMEM budget (MB) used for factor selection and as the Pallas
# vmem_limit_bytes cap. Mosaic's DEFAULT scoped-VMEM cap is ~16 MB, but the
# physical VMEM on v5e-class chips is 128 MB and
# pltpu.CompilerParams(vmem_limit_bytes=...) raises the compiler's cap.
# The default is resolved per backend on first use: 100 MB on TPU (every
# budget-gated plan shape validated on-chip by benchmarks/tpu_factor_sweep.py
# at this value) and 16 on CPU, where Pallas runs interpreted and the small
# round-3 shapes keep the test suite fast. FLASHFFTCONV_VMEM_MB overrides;
# tests may also monkeypatch VMEM_BUDGET_MB directly.
VMEM_BUDGET_MB: int | None = (
    int(os.environ["FLASHFFTCONV_VMEM_MB"])
    if os.environ.get("FLASHFFTCONV_VMEM_MB")
    else None
)
_TPU_DEFAULT_VMEM_MB = 100
_CPU_DEFAULT_VMEM_MB = 16


def vmem_budget_mb() -> int:
    """The effective per-kernel VMEM budget (MB); see VMEM_BUDGET_MB.

    The 100 MB TPU default was validated on v5e-class chips (128 MB physical
    VMEM). Older generations (v2/v3, ~16 MB VMEM) get the conservative
    default instead, so the budget-gated 512K/1M single-pass plans don't
    fail to compile out of the box there; FLASHFFTCONV_VMEM_MB overrides."""
    if VMEM_BUDGET_MB is not None:
        return VMEM_BUDGET_MB
    import jax

    if jax.default_backend() != "tpu":
        return _CPU_DEFAULT_VMEM_MB
    kind = getattr(jax.devices()[0], "device_kind", "") or ""
    # v4/v5/v6/v7-class chips all carry >=128 MB VMEM per core; v2/v3 ~16 MB.
    if any(old in kind.lower() for old in ("v2", "v3")):
        return _CPU_DEFAULT_VMEM_MB
    return _TPU_DEFAULT_VMEM_MB

# Preferred factorizations for every long size (> MAX_INNER), in measured
# preference order (on-chip autotune: benchmarks/tpu_factor_sweep.py /
# tpu_factor_sweep.json), each gated on the VMEM budget: min_mb is the
# admission estimate of the shape's fused kernel in the mode the dispatch
# can always force (2-factor: _fused2_vmem_mb gated; 3-factor:
# _fused3_vmem_mb unpacked+gated; 4-factor: complex-inner packed+ungated).
# Entries may be 2-factor (one fused-I/O kernel, no butterfly at all),
# 3-factor (one fused long-kernel pass) or 4-factor (butterfly pipeline
# with a fat complex inner). Sizes fall back to the conservative shapes
# below the table when nothing is admitted (Mosaic's ~16 MB default cap).
_LONG_CANDIDATES: dict[int, tuple[tuple[int, tuple[int, ...]], ...]] = {
    # 64K: same forward as (2, 256, 128) but 14% faster fwd+bwd
    # (8.23 vs 9.53 ms at B=2 H=384); fits the 16 MB default cap.
    65536: ((0, (4, 128, 128)),),
    # 512K/1M: single-pass fused 3-factor, gated fwd+bwd compiled and
    # oracle-checked on-chip (tpu_factor_sweep.json): 512K (8,512,128)
    # fwd 9.58 ms ratio 2.72 vs pipeline 12.26/3.40; 1M (16,512,128)
    # fwd 8.85 ms fwd_bwd 25.32 vs (8,512,256) 10.95/31.74. (16,512,128)
    # unrolled took ~30 min to compile in round 4; the fori band loop
    # (_BAND_FORI_ROWS) brings it to 68 s (.r5logs/aot_1m16_4m.log).
    524288: ((41, (8, 512, 128)), (32, (4, 512, 256))),
    1048576: ((49, (16, 512, 128)), (48, (8, 512, 256))),
    # 2M: single-pass (32,256,256) — fwd 5.70 ms vs the pipeline's 6.86
    # (tpu_factor_sweep.json); its backward crashed the compile helper in
    # round 4 but compiles at HEAD in 178 s / 0.52 G temp with the fori
    # band loop (.r5logs/bwd2m_aot_head.log). 4M: (64,256,256) backward
    # also compiles now (89 s); pending on-chip timing the pipeline stays
    # the 4M default — the fat bigger-inner pipelines lose at 4M
    # ((8,8,512,128): 18.2/61.8 vs the control's 12.9/46.0).
    2097152: ((84, (32, 256, 256)),),
}
# Back-compat alias (round-3 name, still referenced by older notes).
_LONG3_CANDIDATES = _LONG_CANDIDATES


def is_supported_seqlen(seqlen: int) -> bool:
    return (
        MIN_SEQLEN <= seqlen <= MAX_SEQLEN and (seqlen & (seqlen - 1)) == 0
    )


# Below this size a single (N, N) DFT matmul batched over B*H beats the
# Monarch split on TPU (the extra FLOPs are trivial, and they land on the
# MXU as (rows, N) @ (N, N) matmuls while the small-N 2-factor kernel is
# VPU-pass-bound). The round-5 on-chip A/B (tpu_smalln_probe.jsonl, B=16
# H=768 gated, scan-amortized) measured the cutover directly: direct wins
# 2.7x at 256 (0.055 vs 0.149 ms/call) and ~7% at 512 (0.191 vs 0.204),
# and loses 2.3x at 1024 (0.595 vs 0.263) where the (N, N) matmul's extra
# FLOPs stop being free. 1024..32K keep the 2-way split with
# channel-grouped block-diagonal stage-1 matmuls (_group_size), which
# keeps the MXU contraction depth at 128 even though n1 < 128.
# FLASHFFTCONV_DIRECT_MAX overrides for A/B.
DIRECT_MAX = int(os.environ.get("FLASHFFTCONV_DIRECT_MAX", "512"))


def default_factors(seqlen: int) -> tuple[int, ...]:
    """TPU-native factorization of a power-of-two FFT size.

    <= DIRECT_MAX: one factor — a single dense DFT matmul (see DIRECT_MAX).
    <= 32K: two factors as close to square as possible (f1 >= f2), both <= 256.
    > 32K: an outer butterfly factor ``seqlen // MAX_INNER`` followed by the
    two-way split of the 32K inner FFT. (The reference uses outer factors
    16..128 with inner sizes 4K-32K; see SURVEY.md §2.3.)
    """
    if not is_supported_seqlen(seqlen):
        raise ValueError(
            f"seqlen {seqlen} not supported: must be a power of two in "
            f"[{MIN_SEQLEN}, {MAX_SEQLEN}]"
        )
    # Per-size default-plan override for A/Bs without code edits, e.g.
    # FLASHFFTCONV_FACTORS="2097152:16,512,256" (same syntax as
    # FLASHFFTCONV_BWD_FACTORS; validated to multiply to N).
    for item in os.environ.get("FLASHFFTCONV_FACTORS", "").split(";"):
        if ":" not in item:
            continue
        n_s, f_s = item.split(":", 1)
        try:
            n_val = int(n_s)
            facs = tuple(int(x) for x in f_s.split(","))
        except ValueError as e:
            raise ValueError(
                f"FLASHFFTCONV_FACTORS: cannot parse item {item!r} "
                "(expected 'N:f0,f1,...[;N:...]')"
            ) from e
        if n_val == seqlen:
            prod = 1
            for x in facs:
                prod *= x
            if prod != seqlen:
                raise ValueError(
                    f"FLASHFFTCONV_FACTORS: factors {facs} multiply to "
                    f"{prod}, not {seqlen}"
                )
            return facs
    m = seqlen.bit_length() - 1
    if seqlen <= DIRECT_MAX:
        return (seqlen,)
    if seqlen <= MAX_INNER:
        # f2 = 128 keeps the minor (lane) dimension exactly one MXU/VPU lane
        # tile wide at every size; f1 = N/128 in [16, 256] is the stage-1
        # contraction dim.
        f2 = 128
        f1 = seqlen // f2
        assert f1 * f2 == seqlen and f1 <= _MAX_FACTOR
        return (f1, f2)
    # > 32K: measured winners first (budget-gated, _LONG_CANDIDATES), then
    # the conservative fallbacks that fit Mosaic's ~16 MB default cap.
    for min_mb, factors in _LONG_CANDIDATES.get(seqlen, ()):
        if vmem_budget_mb() >= min_mb:
            return factors
    if seqlen <= 8 * MAX_INNER:  # 64K-256K: fused long kernel holds (f0, N1, N2)
        outer = seqlen // MAX_INNER
        return (outer,) + default_factors(MAX_INNER)
    # 512K-4M fallback: the 4-level pipeline — a Pallas outer butterfly over
    # f00, the fused long kernel over a 128K inner block, and an inverse
    # butterfly (f0=4 keeps the complex-I/O inner inside the 16 MB default).
    f00 = seqlen // (4 * MAX_INNER)
    return (f00, 4) + default_factors(MAX_INNER)


def _dft_matrix(n: int, sign: int) -> np.ndarray:
    """n x n (I)DFT matrix, complex128. sign=-1 forward, +1 inverse (unnormalized)."""
    idx = np.arange(n, dtype=np.int64)
    phase = (idx[:, None] * idx[None, :]) % n
    return np.exp(sign * 2j * np.pi * phase.astype(np.float64) / n)


def _twiddle(f: int, r: int, sign: int) -> np.ndarray:
    """(f, r) twiddle table w[k, t] = exp(sign * 2*pi*i * k * t / (f*r))."""
    n = f * r
    k = np.arange(f, dtype=np.int64)[:, None]
    t = np.arange(r, dtype=np.int64)[None, :]
    phase = (k * t) % n
    return np.exp(sign * 2j * np.pi * phase.astype(np.float64) / n)


def _planar(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return (
        np.ascontiguousarray(x.real.astype(np.float32)),
        np.ascontiguousarray(x.imag.astype(np.float32)),
    )


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["dft_re", "dft_im", "idft_re", "idft_im", "tw_re", "tw_im"],
    meta_fields=["seqlen", "factors", "compute_dtype_name"],
)
@dataclasses.dataclass(frozen=True)
class FftPlan:
    """Precomputed tables for a Monarch-decomposed FFT convolution.

    Data fields (tuples of f32 arrays, one entry per stage ``j``):
      dft_re/dft_im[j]:   (f_j, f_j) forward DFT matrix.
      idft_re/idft_im[j]: (f_j, f_j) inverse DFT matrix; stage 0 carries the
                          1/N normalization.
      tw_re/tw_im[j]:     (f_j, R_j) forward twiddles, R_j = prod(factors[j+1:]).
                          Inverse twiddles are the conjugates (negate tw_im).
                          The last stage has R_m = 1 and no twiddle entry.
    """

    seqlen: int
    factors: tuple[int, ...]
    compute_dtype_name: str
    dft_re: tuple[Any, ...]
    dft_im: tuple[Any, ...]
    idft_re: tuple[Any, ...]
    idft_im: tuple[Any, ...]
    tw_re: tuple[Any, ...]
    tw_im: tuple[Any, ...]

    @property
    def compute_dtype(self):
        return jnp.dtype(self.compute_dtype_name)

    @property
    def n_stages(self) -> int:
        return len(self.factors)


def make_plan(
    seqlen: int,
    compute_dtype=jnp.bfloat16,
    factors: tuple[int, ...] | None = None,
) -> FftPlan:
    """Build an FftPlan for the given power-of-two seqlen.

    compute_dtype is the dtype matmul *operands* are cast to (accumulation is
    always f32 via preferred_element_type); tables themselves are stored f32.
    """
    # TPU has no fp16 MXU path and Mosaic won't lower f16 kernels; the
    # reference's fp16 mode maps to bf16 here (same width, wider exponent).
    if jnp.dtype(compute_dtype) == jnp.float16:
        compute_dtype = jnp.bfloat16
    if factors is None:
        factors = default_factors(seqlen)
    else:
        factors = tuple(int(f) for f in factors)
        if math.prod(factors) != seqlen:
            raise ValueError(f"factors {factors} do not multiply to {seqlen}")

    dft_re, dft_im, idft_re, idft_im = [], [], [], []
    tw_re, tw_im = [], []
    n = seqlen
    for j, f in enumerate(factors):
        r = n // f  # remaining sub-FFT length handled by later stages
        fwd = _dft_matrix(f, -1)
        inv = _dft_matrix(f, +1)
        if j == 0:
            inv = inv / seqlen  # fold the 1/N normalization into one matrix
        fr, fi = _planar(fwd)
        ir, ii = _planar(inv)
        dft_re.append(fr)
        dft_im.append(fi)
        idft_re.append(ir)
        idft_im.append(ii)
        if r > 1:
            wr, wi = _planar(_twiddle(f, r, -1))
            tw_re.append(wr)
            tw_im.append(wi)
        n = r

    # ensure_compile_time_eval: plans are built wherever the first conv call
    # happens — often *inside* a jit/grad trace (e.g. seq_fft_conv under
    # shard_map). The tables are pure numpy constants; materializing them
    # eagerly keeps them concrete so caching/registering a plan built under
    # one trace never leaks tracers into another.
    with jax.ensure_compile_time_eval():
        to_j = lambda xs: tuple(jnp.asarray(x) for x in xs)
        plan = _build_plan(seqlen, factors, compute_dtype, to_j,
                           dft_re, dft_im, idft_re, idft_im, tw_re, tw_im)
    return plan


def _build_plan(seqlen, factors, compute_dtype, to_j,
                dft_re, dft_im, idft_re, idft_im, tw_re, tw_im):
    return FftPlan(
        seqlen=seqlen,
        factors=factors,
        compute_dtype_name=jnp.dtype(compute_dtype).name,
        dft_re=to_j(dft_re),
        dft_im=to_j(dft_im),
        idft_re=to_j(idft_re),
        idft_im=to_j(idft_im),
        tw_re=to_j(tw_re),
        tw_im=to_j(tw_im),
    )


@functools.lru_cache(maxsize=64)
def get_plan(seqlen: int, compute_dtype_name: str = "bfloat16") -> FftPlan:
    """Cached plan lookup so every layer of a model shares one plan per seqlen
    (the reference's one-FlashFFTConv-per-model invariant, README.md:108-133)."""
    return make_plan(seqlen, compute_dtype=jnp.dtype(compute_dtype_name))


def kf_permute(k_f: jax.Array, factors: tuple[int, ...]) -> jax.Array:
    """Permute a natural-order spectrum (..., N) into Monarch layout (..., f1, ..., fm).

    The Monarch-transformed array X[k1, ..., km] holds frequency
    k = k1 + f1*k2 + f1*f2*k3 + ...; equivalently
    ``k_f.reshape(fm, ..., f1).transpose(reverse)``. This is the generalization
    of the reference's per-size k_f permutations (e.g.
    /root/reference/flashfftconv/conv.py:585,620,695-696).
    """
    batch = k_f.shape[:-1]
    nb = len(batch)
    x = k_f.reshape(*batch, *factors[::-1])
    perm = tuple(range(nb)) + tuple(nb + len(factors) - 1 - i for i in range(len(factors)))
    return jnp.transpose(x, perm)


def kf_unpermute(x: jax.Array, factors: tuple[int, ...]) -> jax.Array:
    """Inverse of kf_permute: Monarch layout (..., f1, ..., fm) -> natural (..., N)."""
    batch = x.shape[: -len(factors)]
    nb = len(batch)
    perm = tuple(range(nb)) + tuple(nb + len(factors) - 1 - i for i in range(len(factors)))
    n = math.prod(factors)
    return jnp.transpose(x, perm).reshape(*batch, n)
