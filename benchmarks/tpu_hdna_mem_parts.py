"""Compile-only memory probes for the PIECES of the HyenaDNA-1M block:
mixer-only grad, MLP-only grad, block grad, embed+head grad — to locate the
~13 GB fixed cost the full train-step probe shows at one layer.

Usage: python benchmarks/tpu_hdna_mem_parts.py [part ...]
parts: mixer mlp block head  (default: all)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import flax.linen as nn
import jax
import jax.numpy as jnp

L, D = 1_048_576, 256


def report(name, fn, *args):
    try:
        c = jax.jit(fn).lower(*args).compile()
        a = c.memory_analysis()
        print(f"{name}: temp {a.temp_size_in_bytes/2**30:.2f} G "
              f"(+args {a.argument_size_in_bytes/2**30:.2f})", flush=True)
    except Exception as e:
        msg = str(e)
        cut = msg.find("Largest program allocations")
        print(f"{name}: FAILED {msg[:300]}", flush=True)
        if cut >= 0:
            print(msg[cut : cut + 2500], flush=True)


def grad_of(module, x, extra_kwargs=None):
    p = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), x))["params"],
    )

    def loss(p, x):
        y = module.apply({"params": p}, x, **(extra_kwargs or {}))
        return jnp.sum(y.astype(jnp.float32) ** 2)

    return (lambda p_, x_: jax.grad(loss)(p_, x_)), p, x


def main():
    parts = sys.argv[1:] or ["mixer", "mlp", "block", "head"]
    from flashfftconv_tpu.models.hyena import HyenaOperator
    from flashfftconv_tpu.models.lm import Block, Mlp

    hchunks = int(os.environ.get("HDNA_MEM_HCHUNKS", "4"))
    short = os.environ.get("HDNA_MEM_SHORT", "pallas") or None
    mk = {"impl": "auto", "filter_args": {"emb_dim": 5},
          "conv_h_chunks": hchunks, "short_filter_impl": short}
    x = jnp.zeros((1, L, D), jnp.bfloat16)
    if "mixer" in parts:
        m = HyenaOperator(d_model=D, l_max=L, **mk)
        fn, p, xx = grad_of(m, x)
        report(f"mixer grad (hchunks={hchunks} short={short})", fn, p, xx)
    if "mlp" in parts:
        m = Mlp(4 * D, D)
        fn, p, xx = grad_of(m, x)
        report("mlp grad", fn, p, xx)
    if "block" in parts:
        m = Block(d_model=D, d_inner=4 * D, mixer="hyena", mixer_kwargs=mk)
        fn, p, xx = grad_of(m, x)
        report("block grad (remat off)", fn, p, xx)

        rb = nn.remat(Block, static_argnums=(2,))(
            d_model=D, d_inner=4 * D, mixer="hyena", mixer_kwargs=mk)
        fn, p, xx = grad_of(rb, x)
        report("block grad (remat on)", fn, p, xx)
    if "head" in parts:
        class Head(nn.Module):
            @nn.compact
            def __call__(self, h):
                emb = nn.Embed(8, D, dtype=jnp.bfloat16, name="emb")
                h32 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(
                    h.astype(jnp.float32))
                return emb.attend(h32.astype(jnp.bfloat16)).astype(jnp.float32)

        m = Head()
        fn, p, xx = grad_of(m, x)
        report("ln_f+tied-head grad", fn, p, xx)


if __name__ == "__main__":
    main()


def extra_parts():
    """conv-only and conv-stubbed mixer probes (run with 'conv'/'noconv')."""
    import numpy as np

    from flashfftconv_tpu.models.hyena import HyenaOperator
    from flashfftconv_tpu.ops import dispatch
    from flashfftconv_tpu.ops.plan import get_plan

    hchunks = int(os.environ.get("HDNA_MEM_HCHUNKS", "4"))
    parts = sys.argv[1:]
    if "conv" in parts:
        plan = get_plan(2 * L, "bfloat16")
        x = jnp.zeros((1, D, L), jnp.bfloat16)
        k = jnp.zeros((D, L), jnp.float32)

        def conv_loss(x, k):
            if hchunks > 1:
                c = hchunks
                xs = x.reshape(1, c, D // c, L).swapaxes(0, 1)
                ks = k.reshape(c, D // c, L)
                ys = jax.lax.map(
                    lambda ab: dispatch.fft_conv(plan, ab[0], ab[1]), (xs, ks))
                y = ys.swapaxes(0, 1).reshape(1, D, L)
            else:
                y = dispatch.fft_conv(plan, x, k)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        report(f"conv-only grad (hchunks={hchunks}, N=2M)",
               lambda x_, k_: jax.grad(conv_loss, argnums=(0, 1))(x_, k_), x, k)
    if "noconv" in parts:
        orig = dispatch.fft_conv
        dispatch.fft_conv = lambda plan, x, k, **kw: x + 0 * jnp.mean(k)
        try:
            mk = {"impl": "auto", "filter_args": {"emb_dim": 5},
                  "conv_h_chunks": 0,
                  "short_filter_impl": os.environ.get("HDNA_MEM_SHORT", "pallas") or None}
            m = HyenaOperator(d_model=D, l_max=L, **mk)
            fn, p, xx = grad_of(m, jnp.zeros((1, L, D), jnp.bfloat16))
            report("mixer grad with conv stubbed to identity", fn, p, xx)
        finally:
            dispatch.fft_conv = orig


if __name__ == "__main__" and any(a in ("conv", "noconv") for a in sys.argv[1:]):
    extra_parts()
