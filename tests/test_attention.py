"""Flash-attention wrapper + MHA mixer tests (reference analog:
examples/hyena/flash-attention/tests/test_flash_attn.py — kernel vs PyTorch
reference parity; here the Pallas TPU kernel is exercised on real hardware
via benchmarks/tpu_attention.py, and on CPU the dispatch + decode paths)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashfftconv_tpu.models.attention import MHAOperator
from flashfftconv_tpu.ops.attention import flash_mha, mha_reference


def _qkv(rng, b=2, h=4, l=256, d=64, dtype=jnp.float32):
    def one():
        return jnp.asarray(rng.standard_normal((b, h, l, d)).astype(np.float32)).astype(dtype)

    return one(), one(), one()


def test_flash_mha_fallback_matches_reference(rng):
    q, k, v = _qkv(rng)
    out = flash_mha(q, k, v, causal=True, impl="auto")
    ref = mha_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_flash_mha_noncausal(rng):
    q, k, v = _qkv(rng, l=128)
    out = flash_mha(q, k, v, causal=False)
    ref = mha_reference(q, k, v, causal=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_flash_mha_grads_finite(rng):
    q, k, v = _qkv(rng, l=128)

    def loss(q, k, v):
        return jnp.sum(flash_mha(q, k, v, causal=True) ** 2)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in (gq, gk, gv):
        assert np.isfinite(np.asarray(g)).all()


def test_mha_operator_decode_matches_forward(rng):
    """KV-cached incremental decoding produces the same outputs as the full
    causal forward (the reference's InferenceParams decode-path guarantee)."""
    b, l, d = 2, 16, 32
    op = MHAOperator(d_model=d, num_heads=4, causal=True, impl="xla")
    u = jnp.asarray(rng.standard_normal((b, l, d)).astype(np.float32))
    variables = op.init(jax.random.PRNGKey(0), u)
    y_full = op.apply(variables, u, deterministic=True)

    cache = op.init_cache(b, max_length=l)
    ys = []
    for t in range(l):
        y_t, cache = op.apply_step(variables, u[:, t : t + 1], cache, t)
        ys.append(y_t)
    y_inc = jnp.concatenate(ys, axis=1)
    np.testing.assert_allclose(np.asarray(y_inc), np.asarray(y_full), atol=1e-5)


@pytest.mark.parametrize("dropout", [0.0, 0.1])
def test_mha_operator_forward_and_grad(rng, dropout):
    b, l, d = 2, 64, 32
    op = MHAOperator(d_model=d, num_heads=4, dropout=dropout)
    u = jnp.asarray(rng.standard_normal((b, l, d)).astype(np.float32))
    variables = op.init(jax.random.PRNGKey(0), u)
    y = op.apply(variables, u, deterministic=True)
    assert y.shape == u.shape

    def loss(params):
        out = op.apply(
            {"params": params},
            u,
            deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return jnp.sum(out**2)

    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
