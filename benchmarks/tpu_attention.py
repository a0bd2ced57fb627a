"""Flash-attention hardware check: Pallas TPU kernel vs the XLA O(L^2)
reference — numerical parity at L=1K/2K, then long-context L=16K fwd+bwd
with peak-memory accounting to demonstrate the O(L) memory path (reference
analog: examples/hyena/flash-attention/tests/test_flash_attn.py + its
benchmarks). Writes benchmarks/tpu_attention.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT_PATH = os.path.join(os.path.dirname(__file__), "tpu_attention.json")


def main():
    import jax
    import jax.numpy as jnp

    from flashfftconv_tpu.ops.attention import flash_mha, mha_reference

    rng = np.random.default_rng(0)
    results = {"device": str(jax.devices()[0]), "cases": []}

    def mk(b, h, l, d, dtype):
        def one():
            return jnp.asarray(rng.standard_normal((b, h, l, d)).astype(np.float32)).astype(dtype)

        return one(), one(), one()

    # --- parity: flash kernel vs XLA reference -------------------------------
    for l in (1024, 2048):
        for causal in (True, False):
            q, k, v = mk(2, 4, l, 128, jnp.bfloat16)
            out = jax.jit(lambda q, k, v: flash_mha(q, k, v, causal=causal, impl="flash"))(q, k, v)
            out.block_until_ready()
            ref = mha_reference(
                q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32), causal=causal
            )
            err = float(np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)).max())
            rec = {"case": "parity", "L": l, "causal": causal, "max_err": err, "tol": 2e-2,
                   "ok": err < 2e-2}
            results["cases"].append(rec)
            print(rec, flush=True)

    # --- grad parity at L=1024 ----------------------------------------------
    q, k, v = mk(1, 4, 1024, 128, jnp.bfloat16)
    dout = mk(1, 4, 1024, 128, jnp.bfloat16)[0]

    def loss(impl):
        return lambda q, k, v: jnp.sum(
            flash_mha(q, k, v, causal=True, impl=impl).astype(jnp.float32)
            * dout.astype(jnp.float32)
        )

    g_fl = jax.jit(jax.grad(loss("flash"), argnums=(0, 1, 2)))(q, k, v)
    jax.block_until_ready(g_fl)
    g_ref = jax.jit(jax.grad(loss("xla"), argnums=(0, 1, 2)))(q, k, v)
    jax.block_until_ready(g_ref)
    for name, a, b in zip("qkv", g_fl, g_ref):
        err = float(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max())
        rec = {"case": f"d{name}_parity", "L": 1024, "max_err": err, "tol": 5e-2, "ok": err < 5e-2}
        results["cases"].append(rec)
        print(rec, flush=True)

    # --- ALiBi bias through the flash kernel's ab operand ---------------------
    from flashfftconv_tpu.ops.attention import alibi_bias, blocksparse_mha

    l = 1024
    q, k, v = mk(2, 4, l, 128, jnp.bfloat16)
    bias = alibi_bias(4, l, l)
    out = jax.jit(lambda q, k, v: flash_mha(q, k, v, causal=True, impl="flash", bias=bias))(q, k, v)
    ref = mha_reference(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
                        causal=True, bias=bias)
    err = float(np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)).max())
    rec = {"case": "alibi_parity", "L": l, "max_err": err, "tol": 2e-2, "ok": err < 2e-2}
    results["cases"].append(rec)
    print(rec, flush=True)

    # --- sliding window via the splash kernel ---------------------------------
    for w in (128, 512):
        out = jax.jit(lambda q, k, v: flash_mha(q, k, v, causal=True, impl="flash", window=w))(q, k, v)
        ref = mha_reference(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
                            causal=True, window=w)
        err = float(np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)).max())
        rec = {"case": "window_parity", "L": l, "window": w, "max_err": err, "tol": 2e-2,
               "ok": err < 2e-2}
        results["cases"].append(rec)
        print(rec, flush=True)

    # window grads through the splash VJP
    gw = jax.jit(jax.grad(lambda q, k, v: flash_mha(q, k, v, causal=True, impl="flash",
                                                    window=128).astype(jnp.float32).sum(),
                          argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(lambda q, k, v: flash_mha(q, k, v, causal=True, impl="xla",
                                                    window=128).astype(jnp.float32).sum(),
                          argnums=(0, 1, 2)))(q, k, v)
    for name, a, b2 in zip("qkv", gw, gr):
        err = float(np.abs(np.asarray(a, np.float32) - np.asarray(b2, np.float32)).max())
        rec = {"case": f"window_d{name}", "L": l, "max_err": err, "tol": 5e-2, "ok": err < 5e-2}
        results["cases"].append(rec)
        print(rec, flush=True)

    # --- packed sequences (segment ids) through the flash kernel --------------
    seg = np.zeros((2, l), np.int32)
    seg[:, : l // 2] = 1
    seg[:, l // 2 :] = 2
    seg = jnp.asarray(seg)
    out = jax.jit(lambda q, k, v: flash_mha(q, k, v, causal=True, impl="flash",
                                            segment_ids=seg))(q, k, v)
    ref = mha_reference(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
                        causal=True, segment_ids=seg)
    err = float(np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)).max())
    rec = {"case": "segment_ids_parity", "L": l, "max_err": err, "tol": 2e-2, "ok": err < 2e-2}
    results["cases"].append(rec)
    print(rec, flush=True)

    # --- blocksparse via the splash kernel ------------------------------------
    nb = l // 256
    mrng = np.random.default_rng(1)
    blockmask = mrng.integers(0, 2, size=(nb, nb))
    blockmask[np.arange(nb), np.arange(nb)] = 1
    out = blocksparse_mha(q, k, v, blockmask, block_size=256, causal=True, impl="flash")
    ref = blocksparse_mha(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
                          blockmask, block_size=256, causal=True, impl="xla")
    err = float(np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)).max())
    rec = {"case": "blocksparse_parity", "L": l, "max_err": err, "tol": 2e-2, "ok": err < 2e-2}
    results["cases"].append(rec)
    print(rec, flush=True)

    # --- long context: L=16K forward+backward, memory accounting -------------
    b, h, l, d = 1, 8, 16384, 128
    q, k, v = mk(b, h, l, d, jnp.bfloat16)

    for impl in ("flash", "xla"):
        f = jax.jit(lambda q, k, v: jnp.sum(flash_mha(q, k, v, causal=True, impl=impl) ** 2))
        gradf = jax.jit(jax.grad(lambda q, k, v: flash_mha(q, k, v, causal=True, impl=impl)
                                 .astype(jnp.float32).sum(), argnums=(0, 1, 2)))
        try:
            lowered = gradf.lower(q, k, v).compile()
            mem = lowered.memory_analysis()
            peak = int(getattr(mem, "temp_size_in_bytes", 0))
            t0 = time.time()
            out = gradf(q, k, v)
            jax.block_until_ready(out)
            t_first = time.time() - t0
            t0 = time.time()
            for _ in range(5):
                out = gradf(q, k, v)
            jax.block_until_ready(out)
            t_avg = (time.time() - t0) / 5
            rec = {"case": "L16K_fwd_bwd", "impl": impl, "temp_bytes": peak,
                   "ms": round(t_avg * 1e3, 2), "ok": True}
        except Exception as e:
            rec = {"case": "L16K_fwd_bwd", "impl": impl, "ok": False, "error": repr(e)[:300]}
        results["cases"].append(rec)
        print(rec, flush=True)

    json.dump(results, open(OUT_PATH, "w"), indent=1)
    bad = [c for c in results["cases"] if not c.get("ok")]
    print(f"DONE: {len(results['cases'])} cases, {len(bad)} failures", flush=True)
    sys.exit(1 if any(c["case"] != "L16K_fwd_bwd" for c in bad) else 0)


if __name__ == "__main__":
    main()
