"""Probe the REAL per-kernel VMEM budget on the attached TPU.

Round-2/3 kernels were tuned against Mosaic's default scoped-VMEM limit
(observed OOM at ~22 MB, docs/DESIGN.md:233), but the physical VMEM on
v5e-class chips is believed to be much larger, and
pltpu.CompilerParams(vmem_limit_bytes=...) can raise the compiler's cap.
This probe binary-searches the usable budget:

  for each candidate limit L in MB_CANDIDATES:
    compile + run a kernel whose VMEM scratch + I/O blocks total ~L
    (copy-through with a scratch round trip so nothing is DCE'd)

Prints one JSON line per trial and a final summary; writes
benchmarks/tpu_vmem_probe.json. Also times a bandwidth-bound copy at the
largest working size to confirm there is no perf cliff from large blocks.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT_PATH = os.path.join(os.path.dirname(__file__), "tpu_vmem_probe.json")

MB_CANDIDATES = [16, 24, 32, 48, 64, 80, 96, 110, 120, 127]


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    results = []

    def trial(mb: int):
        """Scratch of ~mb MB (f32) + small I/O blocks; returns (ok, err)."""
        rows = mb * 1024 * 1024 // (4 * 128)  # f32 (rows, 128) scratch

        def kernel(x_ref, o_ref, scratch):
            # touch first and last scratch rows so the full allocation is live
            scratch[0:8, :] = x_ref[...] * 2.0
            scratch[rows - 8 : rows, :] = x_ref[...] + 1.0
            o_ref[...] = scratch[0:8, :] + scratch[rows - 8 : rows, :]

        x = jnp.ones((8, 128), jnp.float32)
        try:
            fn = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((rows, 128), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=(mb + 2) * 1024 * 1024
                ),
            )
            out = jax.jit(fn)(x)
            # kernel computes x*2 + (x+1) = 4 for x = 1
            ok = bool(np.allclose(np.asarray(out), 4.0))
            return ok, None if ok else f"wrong value {np.asarray(out).ravel()[0]}"
        except Exception as e:
            return False, repr(e)[:300]

    best = 0
    for mb in MB_CANDIDATES:
        t0 = time.time()
        ok, err = trial(mb)
        rec = {"mb": mb, "ok": ok, "err": err, "wall_s": round(time.time() - t0, 1)}
        results.append(rec)
        print(json.dumps(rec), flush=True)
        if ok:
            best = mb
        else:
            break

    # Bandwidth check with large blocks: copy 256 MB HBM->HBM through
    # big VMEM blocks at the working budget.
    bw = None
    if best >= 32:
        blk_mb = min(best // 3, 32)  # in+out double-buffered ~ 4 blocks live
        rows_blk = blk_mb * 1024 * 1024 // (4 * 128)
        n_blk = max(256 // (2 * blk_mb), 2)

        def copy_kernel(x_ref, o_ref):
            o_ref[...] = x_ref[...] * 1.0001

        x = jnp.ones((n_blk * rows_blk, 128), jnp.float32)
        fn = jax.jit(
            pl.pallas_call(
                copy_kernel,
                grid=(n_blk,),
                in_specs=[
                    pl.BlockSpec((rows_blk, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
                ],
                out_specs=pl.BlockSpec((rows_blk, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=(best + 2) * 1024 * 1024
                ),
            )
        )
        out = fn(x)
        np.asarray(jax.device_get(out.ravel()[0]))
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(x)
        np.asarray(jax.device_get(out.ravel()[0]))
        dt = (time.perf_counter() - t0) / 10
        gb = 2 * x.size * 4 / 1e9
        bw = gb / dt
        print(json.dumps({"copy_block_mb": blk_mb, "gbps": round(bw, 1)}), flush=True)

    summary = {
        "device": str(jax.devices()[0]),
        "max_working_mb": best,
        "copy_gbps_at_large_blocks": None if bw is None else round(bw, 1),
        "results": results,
    }
    json.dump(summary, open(OUT_PATH, "w"), indent=1)
    print(f"max working scratch: {best} MB", flush=True)


if __name__ == "__main__":
    main()
