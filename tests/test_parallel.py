"""Multi-device sharding tests on the virtual 8-device CPU mesh — the
idiomatic TPU replacement for the reference's torchrun multi-GPU tests
(tests/models/test_gpt_parallel.py, SURVEY.md §4): DP/TP training steps and
H-sharded convolution, all in one process via GSPMD."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from flashfftconv_tpu import fft_conv, make_plan
from flashfftconv_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    sequence_sharding,
)

needs_multi = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices (CPU mesh)"
)


@needs_multi
def test_make_mesh_shapes():
    mesh = make_mesh((4, 2), ("dp", "tp"))
    assert mesh.shape == {"dp": 4, "tp": 2}
    with pytest.raises(ValueError):
        make_mesh((3, 2), ("dp", "tp"))


@needs_multi
def test_h_sharded_conv_matches_single_device(rng):
    """Sharding H across the mesh (the TPU escape hatch for the reference's
    B/H caps at large N, SURVEY.md §5.7) is exact: depthwise conv is
    embarrassingly parallel over channels."""
    mesh = make_mesh((1, 8), ("dp", "tp"))
    n, b, h = 1024, 2, 16
    plan = make_plan(n, compute_dtype=jnp.float32)
    u = jnp.asarray(rng.standard_normal((b, h, n)).astype(np.float32) * 0.02)
    k = jnp.asarray(rng.standard_normal((h, n)).astype(np.float32) * 0.02)

    y_single = fft_conv(plan, u, k, impl="xla")

    u_sh = jax.device_put(u, NamedSharding(mesh, P(None, "tp", None)))
    k_sh = jax.device_put(k, NamedSharding(mesh, P("tp", None)))
    f = jax.jit(lambda u, k: fft_conv(plan, u, k, impl="xla"))
    with mesh:
        y_sharded = f(u_sh, k_sh)
    np.testing.assert_allclose(
        np.asarray(y_sharded), np.asarray(y_single), atol=1e-5
    )


@needs_multi
def test_dp_batch_sharded_conv(rng):
    mesh = make_mesh((8, 1), ("dp", "tp"))
    n, b, h = 512, 16, 4
    plan = make_plan(n, compute_dtype=jnp.float32)
    u = jnp.asarray(rng.standard_normal((b, h, n)).astype(np.float32) * 0.02)
    k = jnp.asarray(rng.standard_normal((h, n)).astype(np.float32) * 0.02)
    y_single = fft_conv(plan, u, k, impl="xla")
    u_sh = jax.device_put(u, batch_sharding(mesh, 3))
    with mesh:
        y = jax.jit(lambda u, k: fft_conv(plan, u, k, impl="xla"))(u_sh, k)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_single), atol=1e-5)


@needs_multi
def test_full_train_step_dp_tp():
    """The graft-entry multichip dryrun as a test: full train step jitted
    over a dp x tp mesh."""
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


@needs_multi
def test_sequence_parallel_pointwise(rng):
    """Megatron-SP analog: sequence-sharded activations for pointwise blocks
    (the conv itself is never sequence-sharded, matching the reference)."""
    mesh = make_mesh((1, 8), ("dp", "tp"))
    x = jnp.asarray(rng.standard_normal((2, 64, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((8, 8)).astype(np.float32))
    x_sh = jax.device_put(x, sequence_sharding(mesh, 3, seq_axis=1))
    with mesh:
        y = jax.jit(lambda x, w: jax.nn.gelu(x @ w))(x_sh, w)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(jax.nn.gelu(x @ w)), atol=1e-5
    )


@needs_multi
def test_param_shardings_rules():
    mesh = make_mesh((4, 2), ("dp", "tp"))
    params = {
        "layer_0": {"kernel": jnp.ones((1, 16, 64)), "D": jnp.ones((1, 16))},
        "other": {"w": jnp.ones((3, 3))},
    }
    sh = param_shardings(mesh, params)
    assert sh["layer_0"]["kernel"].spec == P(None, "tp", None)
    assert sh["other"]["w"].spec == P()


@needs_multi
def test_zero1_sharded_optimizer_step(rng):
    """ZeRO-1 analog: optimizer state sharded over dp; one step matches the
    replicated result exactly."""
    import optax

    from flashfftconv_tpu.parallel.mesh import zero1_shardings

    mesh = make_mesh((8, 1), ("dp", "tp"))
    params = {"w": jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))}
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    grads = {"w": jnp.ones((16, 8), jnp.float32)}

    up_ref, _ = tx.update(grads, opt_state, params)

    sh = zero1_shardings(mesh, opt_state)
    opt_sharded = jax.device_put(opt_state, sh)
    with mesh:
        up, new_state = jax.jit(tx.update)(grads, opt_sharded, params)
    np.testing.assert_allclose(np.asarray(up["w"]), np.asarray(up_ref["w"]), atol=1e-6)
    # moments actually live sharded
    mu = jax.tree_util.tree_leaves(new_state)[1]
    assert not mu.sharding.is_fully_replicated


@needs_multi
def test_zero2_grad_sharded_train_step(rng):
    """ZeRO-2 analog: gradients constrained to dp shards inside the train
    step (reduce-scatter instead of all-reduce) + sharded optimizer state;
    the update matches the unsharded step exactly and the compiled program
    reduce-scatters the gradient."""
    import optax

    from flashfftconv_tpu.parallel.mesh import zero2_shardings
    from flashfftconv_tpu.utils.train import (
        TrainState,
        create_train_state,
        make_train_step,
    )

    mesh = make_mesh((8, 1), ("dp", "tp"))
    d = 16
    w = jnp.asarray(rng.standard_normal((d, 10)).astype(np.float32) * 0.1)
    params = {"w": w}

    def apply_fn(variables, x, deterministic=False, rngs=None):
        return x @ variables["params"]["w"]

    tx = optax.adam(1e-2)
    x = jnp.asarray(rng.standard_normal((16, d)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 10, 16).astype(np.int32))
    rng_key = jax.random.PRNGKey(0)

    # Unsharded reference step.
    state0 = create_train_state(params, tx)
    ref_step = make_train_step(apply_fn, tx)
    ref_state, ref_metrics = jax.jit(ref_step)(state0, (x, y), rng_key)

    # ZeRO-2 step: grads constrained over dp, opt state sharded over dp.
    g_sh = zero2_shardings(mesh, params)
    z2_step = make_train_step(apply_fn, tx, grad_shardings=g_sh)
    state = create_train_state(params, tx)
    state = dataclasses_replace_sharded(state, mesh, g_sh)
    x_sh = jax.device_put(x, batch_sharding(mesh, 2))
    with mesh:
        jitted = jax.jit(z2_step)
        hlo = jitted.lower(state, (x_sh, y), rng_key).compile().as_text()
        new_state, metrics = jitted(state, (x_sh, y), rng_key)
    np.testing.assert_allclose(
        np.asarray(new_state.params["w"]), np.asarray(ref_state.params["w"]), atol=1e-6
    )
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), atol=1e-6
    )
    # TPU lowers the dp-sharded-grad pattern to a fused reduce-scatter over
    # ICI; the CPU backend expresses the same exchange as
    # all-reduce + dynamic-slice (no fused op there). Either way each device
    # consumes only its 1/dp grad shard.
    assert "reduce-scatter" in hlo or (
        "all-reduce" in hlo and "dynamic-slice" in hlo
    ), "expected a grad reduce-scatter (or its unfused form) in compiled HLO"


def dataclasses_replace_sharded(state, mesh, grad_sh):
    """Place params replicated and optimizer moments dp-sharded (ZeRO-1/2)."""
    from flashfftconv_tpu.parallel.mesh import zero1_shardings

    opt_sh = zero1_shardings(mesh, state.opt_state)
    return type(state)(
        step=jax.device_put(state.step, NamedSharding(mesh, P())),
        params=jax.device_put(state.params, NamedSharding(mesh, P())),
        opt_state=jax.device_put(state.opt_state, opt_sh),
    )


@needs_multi
class TestSeqShardedConv:
    """Sequence-sharded (context-parallel) FFT conv — the capability the
    reference lacks entirely (its conv is never sequence-sharded, SURVEY.md
    §5.7): one logical N-point conv distributed over the mesh, no device
    holding the full sequence."""

    def _setup(self, rng, n=4096, b=2, h=4, dtype=np.float32):
        mesh = make_mesh((1, 8), ("dp", "sp"))
        u = jnp.asarray(rng.standard_normal((b, h, n)).astype(dtype) * 0.02)
        k = jnp.asarray(
            (rng.standard_normal((h, n)) * 0.02 * np.exp(-0.001 * np.arange(n)))
            .astype(np.float32)
        )
        return mesh, u, k

    def test_matches_reference_f32(self, rng):
        from flashfftconv_tpu.ops.monarch_xla import fft_conv_reference
        from flashfftconv_tpu.parallel.seq_conv import seq_fft_conv

        mesh, u, k = self._setup(rng)
        y_ref = fft_conv_reference(u.shape[-1], u, k)
        with mesh:
            y = jax.jit(
                lambda u, k: seq_fft_conv(
                    u, k, mesh, axis="sp", compute_dtype=jnp.float32
                )
            )(u, k)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)

    def test_gated_bf16(self, rng):
        from flashfftconv_tpu.ops.monarch_xla import fft_conv_reference
        from flashfftconv_tpu.parallel.seq_conv import seq_fft_conv

        mesh, u, k = self._setup(rng)
        b, h, n = u.shape
        pre = jnp.asarray(rng.standard_normal((b, h, n)).astype(np.float32))
        post = jnp.asarray(rng.standard_normal((b, h, n)).astype(np.float32))
        y_ref = fft_conv_reference(n, u, k, pre, post)
        with mesh:
            y = jax.jit(
                lambda u, k, pre, post: seq_fft_conv(
                    u, k, mesh, axis="sp", pregate=pre, postgate=post
                )
            )(u, k, pre, post)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-2)

    def test_stays_sharded(self, rng):
        """No stage regroups the full sequence onto one device: the output
        shards along the sequence axis, and per-device peak live memory stays
        ~O(N/P)."""
        from flashfftconv_tpu.parallel.seq_conv import seq_fft_conv

        mesh, u, k = self._setup(rng)
        sh = NamedSharding(mesh, P(None, None, "sp"))
        u_sh = jax.device_put(u, sh)
        k_sh = jax.device_put(k, NamedSharding(mesh, P(None, "sp")))
        with mesh:
            y = jax.jit(
                lambda u, k: seq_fft_conv(
                    u, k, mesh, axis="sp", compute_dtype=jnp.float32
                )
            )(u_sh, k_sh)
        assert y.sharding.spec == P(None, None, "sp")

    def test_grads_flow(self, rng):
        from flashfftconv_tpu.ops.monarch_xla import fft_conv_reference
        from flashfftconv_tpu.parallel.seq_conv import seq_fft_conv

        mesh, u, k = self._setup(rng, n=1024)

        def loss(u, k):
            with mesh:
                return jnp.sum(
                    seq_fft_conv(
                        u, k, mesh, axis="sp", compute_dtype=jnp.float32
                    )
                    ** 2
                )

        def loss_ref(u, k):
            return jnp.sum(fft_conv_reference(u.shape[-1], u, k) ** 2)

        gu, gk = jax.grad(loss, argnums=(0, 1))(u, k)
        gu_r, gk_r = jax.grad(loss_ref, argnums=(0, 1))(u, k)
        np.testing.assert_allclose(np.asarray(gu), np.asarray(gu_r), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_r), atol=1e-5)

    def test_padded_causal(self, rng):
        """seq_fft_conv_padded matches the single-chip L<N implicit-pad conv
        (the model-layer causal pattern) including gates."""
        from flashfftconv_tpu.parallel.seq_conv import seq_fft_conv_padded

        mesh, u, k = self._setup(rng, n=2048)
        b, h, l = u.shape
        plan = make_plan(2 * l, compute_dtype=jnp.float32)
        pre = jnp.asarray(rng.standard_normal((b, h, l)).astype(np.float32))
        post = jnp.asarray(rng.standard_normal((b, h, l)).astype(np.float32))
        y_ref = fft_conv(plan, u, k, pre, post, impl="xla")
        with mesh:
            y = jax.jit(
                lambda u, k, pre, post: seq_fft_conv_padded(
                    u, k, mesh, axis="sp", pregate=pre, postgate=post,
                    compute_dtype=jnp.float32,
                )
            )(u, k, pre, post)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_ref), atol=1e-4
        )

    def test_long_conv_model_seq_sharded(self, rng):
        """A full LongConvModel trains with the sequence sharded across the
        mesh: forward and one optimizer step match the single-device model
        bit-for-tolerance — context-parallel training of the conv mixer."""
        from flashfftconv_tpu.models.long_conv import LongConvModel
        from flashfftconv_tpu.utils.optim import make_optimizer
        from flashfftconv_tpu.utils.train import create_train_state, make_train_step

        mesh = make_mesh((1, 8), ("dp", "sp"))
        b, l, d_in = 2, 1024, 3
        x = jnp.asarray(rng.standard_normal((b, l, d_in)).astype(np.float32))
        y = jnp.asarray(rng.integers(0, 10, size=(b,)).astype(np.int32))

        def build(seq_mesh):
            return LongConvModel(
                d_input=d_in, d_output=10, d_model=32, n_layers=2,
                dropout=0.0, l_max=l, conv_dtype=jnp.float32, impl="xla",
                seq_mesh=seq_mesh,
            )

        ref_model, sp_model = build(None), build(mesh)
        params = ref_model.init(jax.random.PRNGKey(0), x)["params"]

        logits_ref = ref_model.apply(
            {"params": params}, x, deterministic=True
        )
        x_sh = jax.device_put(x, NamedSharding(mesh, P(None, "sp", None)))
        with mesh:
            logits_sp = jax.jit(
                lambda p, x: sp_model.apply({"params": p}, x, deterministic=True)
            )(params, x_sh)
        np.testing.assert_allclose(
            np.asarray(logits_sp), np.asarray(logits_ref), atol=2e-4
        )

        tx = make_optimizer(params, lr=1e-3, special_lr=1e-3)
        rng_key = jax.random.PRNGKey(1)
        state_ref = create_train_state(params, tx)
        state_sp = create_train_state(params, tx)
        step_ref = make_train_step(ref_model.apply, tx)
        step_sp = make_train_step(sp_model.apply, tx)
        new_ref, m_ref = jax.jit(step_ref)(state_ref, (x, y), rng_key)
        with mesh:
            new_sp, m_sp = jax.jit(step_sp)(state_sp, (x_sh, y), rng_key)
        np.testing.assert_allclose(
            float(m_sp["loss"]), float(m_ref["loss"]), atol=1e-5
        )
        w_ref = new_ref.params["layer_0"]["kernel"]
        w_sp = new_sp.params["layer_0"]["kernel"]
        np.testing.assert_allclose(
            np.asarray(w_sp), np.asarray(w_ref), atol=1e-6
        )

    def test_hyena_operator_seq_sharded(self, rng):
        """The Hyena operator (in-proj, short depthwise filter, gated long
        conv recurrence, out-proj) runs with the sequence sharded across the
        mesh — forward and grads match the single-device operator."""
        from flashfftconv_tpu.models.hyena import HyenaOperator

        mesh = make_mesh((1, 8), ("dp", "sp"))
        b, l, d = 2, 1024, 16
        u = jnp.asarray(rng.standard_normal((b, l, d)).astype(np.float32) * 0.1)

        def build(seq_mesh):
            return HyenaOperator(
                d_model=d, l_max=l, order=2, filter_order=16,
                conv_dtype=jnp.float32, impl="xla", seq_mesh=seq_mesh,
            )

        ref_op, sp_op = build(None), build(mesh)
        params = ref_op.init(jax.random.PRNGKey(0), u)["params"]
        y_ref = ref_op.apply({"params": params}, u)
        u_sh = jax.device_put(u, NamedSharding(mesh, P(None, "sp", None)))
        with mesh:
            y_sp = jax.jit(
                lambda p, u: sp_op.apply({"params": p}, u)
            )(params, u_sh)
        np.testing.assert_allclose(
            np.asarray(y_sp), np.asarray(y_ref), atol=2e-4
        )

        def loss(op):
            def f(p, u):
                with mesh:
                    return jnp.sum(op.apply({"params": p}, u) ** 2)
            return f

        g_ref = jax.grad(loss(ref_op))(params, u)
        g_sp = jax.grad(loss(sp_op))(params, u_sh)
        flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
        flat_s = dict(jax.tree_util.tree_leaves_with_path(g_sp))
        for path, leaf in flat_r:
            np.testing.assert_allclose(
                np.asarray(flat_s[path]), np.asarray(leaf), atol=5e-4,
                err_msg=str(path),
            )


@needs_multi
def test_vocab_parallel_cross_entropy(rng):
    """TP-aware cross entropy over vocab-sharded logits (the reference's
    csrc/xentropy + test_cross_entropy_parallel.py): loss and logits-grad
    match the single-device op without ever gathering the vocab axis."""
    from flashfftconv_tpu.ops.fused import (
        cross_entropy_loss,
        vocab_parallel_cross_entropy,
    )

    mesh = make_mesh((1, 8), ("dp", "tp"))
    b, l, v = 2, 8, 128
    logits = jnp.asarray(rng.standard_normal((b, l, v)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, v, size=(b, l)).astype(np.int32))
    labels = labels.at[0, 0].set(-100)  # exercise ignore_index

    for smooth in (0.0, 0.1):
        ref = cross_entropy_loss(logits, labels, label_smoothing=smooth)
        with mesh:
            par = jax.jit(
                lambda lg, lb: vocab_parallel_cross_entropy(
                    lg, lb, mesh, axis="tp", label_smoothing=smooth
                )
            )(logits, labels)
        np.testing.assert_allclose(float(par), float(ref), atol=1e-6)

    def loss_par(lg):
        with mesh:
            return vocab_parallel_cross_entropy(lg, labels, mesh, axis="tp")

    g_par = jax.grad(loss_par)(logits)
    g_ref = jax.grad(lambda lg: cross_entropy_loss(lg, labels))(logits)
    np.testing.assert_allclose(np.asarray(g_par), np.asarray(g_ref), atol=1e-6)


@needs_multi
def test_conv_lm_seq_sharded(rng):
    """ConvLMHeadModel accepts seq_mesh through mixer_kwargs: the full LM
    (embeddings, Hyena blocks, MLPs, tied head) runs with the sequence
    sharded; logits match the single-device model."""
    from flashfftconv_tpu.models.lm import ConvLMHeadModel

    mesh = make_mesh((1, 8), ("dp", "sp"))
    b, l, vocab = 2, 512, 32
    ids = jnp.asarray(rng.integers(0, vocab, size=(b, l)).astype(np.int32))

    def build(seq_mesh):
        return ConvLMHeadModel(
            vocab_size=vocab, d_model=16, n_layer=1, d_inner=32, l_max=l,
            dtype=jnp.float32,
            mixer="hyena",
            mixer_kwargs={
                "conv_dtype": jnp.float32, "impl": "xla",
                "filter_order": 16, "seq_mesh": seq_mesh,
            },
        )

    ref_lm, sp_lm = build(None), build(mesh)
    params = ref_lm.init(jax.random.PRNGKey(0), ids)["params"]
    logits_ref = ref_lm.apply({"params": params}, ids)
    ids_sh = jax.device_put(ids, NamedSharding(mesh, P(None, "sp")))
    with mesh:
        logits_sp = jax.jit(
            lambda p, i: sp_lm.apply({"params": p}, i)
        )(params, ids_sh)
    np.testing.assert_allclose(
        np.asarray(logits_sp), np.asarray(logits_ref), atol=5e-4
    )


@needs_multi
def test_seq_conv_p4_and_short_kernel(rng):
    """seq conv on a 4-wide axis (devices left over for dp) and a kernel
    shorter than the padded FFT size, vs the single-chip implicit-pad conv."""
    from flashfftconv_tpu.parallel.seq_conv import seq_fft_conv_padded

    mesh = make_mesh((2, 4), ("dp", "sp"))
    b, h, l, k_len = 2, 3, 512, 200
    u = jnp.asarray(rng.standard_normal((b, h, l)).astype(np.float32) * 0.02)
    k = jnp.asarray(rng.standard_normal((h, k_len)).astype(np.float32) * 0.02)
    plan = make_plan(2 * l, compute_dtype=jnp.float32)
    y_ref = fft_conv(plan, u, k, impl="xla")
    with mesh:
        y = jax.jit(
            lambda u, k: seq_fft_conv_padded(
                u, k, mesh, axis="sp", compute_dtype=jnp.float32
            )
        )(u, k)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)


@needs_multi
class TestSeqConvPallasUnderMesh:
    """impl='pallas' inside shard_map: the fused Pallas band-conv kernels
    (interpret mode on CPU, compiled on TPU) composed with the distributed
    FFT's all_to_alls. Proves the Pallas-under-mesh composition the
    single-chip parity suite can't."""

    def test_matches_xla_impl(self, rng):
        from flashfftconv_tpu.ops.monarch_xla import fft_conv_reference
        from flashfftconv_tpu.parallel.seq_conv import seq_fft_conv

        mesh = make_mesh((1, 8), ("dp", "sp"))
        n, b, h = 4096, 2, 4  # N2=512: 2-factor fused tile kernel per device
        u = jnp.asarray(rng.standard_normal((b, h, n)).astype(np.float32) * 0.02)
        k = jnp.asarray(
            (rng.standard_normal((h, n)) * 0.02 * np.exp(-0.001 * np.arange(n)))
            .astype(np.float32)
        )
        y_ref = fft_conv_reference(n, u, k)
        with mesh:
            y = jax.jit(
                lambda u, k: seq_fft_conv(
                    u, k, mesh, axis="sp", compute_dtype=jnp.float32,
                    impl="pallas",
                )
            )(u, k)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)

    def test_gated_grads_match_reference(self, rng):
        """custom_vjp of the Pallas band conv (adjoint = conj-kernel band
        conv; dkf = conj(F b) * F dy / N2) against jnp.fft AD."""
        from flashfftconv_tpu.ops.monarch_xla import fft_conv_reference
        from flashfftconv_tpu.parallel.seq_conv import seq_fft_conv

        mesh = make_mesh((1, 8), ("dp", "sp"))
        n, b, h = 4096, 2, 3
        u = jnp.asarray(rng.standard_normal((b, h, n)).astype(np.float32) * 0.02)
        k = jnp.asarray(
            (rng.standard_normal((h, n)) * 0.02 * np.exp(-0.001 * np.arange(n)))
            .astype(np.float32)
        )
        pre = jnp.asarray(rng.standard_normal((b, h, n)).astype(np.float32))
        post = jnp.asarray(rng.standard_normal((b, h, n)).astype(np.float32))

        def loss(u, k, pre, post):
            with mesh:
                return jnp.sum(
                    seq_fft_conv(
                        u, k, mesh, axis="sp", pregate=pre, postgate=post,
                        compute_dtype=jnp.float32, impl="pallas",
                    )
                    ** 2
                )

        def loss_ref(u, k, pre, post):
            return jnp.sum(fft_conv_reference(n, u, k, pre, post) ** 2)

        grads = jax.grad(loss, argnums=(0, 1, 2, 3))(u, k, pre, post)
        grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(u, k, pre, post)
        for g, gr in zip(grads, grads_ref):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(gr), atol=2e-4, rtol=1e-3
            )

    def test_padded_pallas(self, rng):
        from flashfftconv_tpu.parallel.seq_conv import seq_fft_conv_padded

        mesh = make_mesh((2, 4), ("dp", "sp"))
        b, h, l = 2, 4, 4096  # N=8192 over 4 devices: N2=2048 fused kernel
        u = jnp.asarray(rng.standard_normal((b, h, l)).astype(np.float32) * 0.02)
        k = jnp.asarray(rng.standard_normal((h, 1000)).astype(np.float32) * 0.02)
        plan = make_plan(2 * l, compute_dtype=jnp.float32)
        y_ref = fft_conv(plan, u, k, impl="xla")
        with mesh:
            y = jax.jit(
                lambda u, k: seq_fft_conv_padded(
                    u, k, mesh, axis="sp", compute_dtype=jnp.float32,
                    impl="pallas",
                )
            )(u, k)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)

    @pytest.mark.slow
    def test_three_factor_band(self, rng):
        """Per-device N2=64K exercises the fused *long* kernel (3-factor
        plan) inside shard_map — the multi-device analog of the single-chip
        64K-256K path."""
        from flashfftconv_tpu.ops.monarch_xla import fft_conv_reference
        from flashfftconv_tpu.parallel.seq_conv import seq_fft_conv

        mesh = make_mesh((1, 8), ("dp", "sp"))
        n, b, h = 524288, 1, 1
        u = jnp.asarray(rng.standard_normal((b, h, n)).astype(np.float32) * 0.02)
        k = jnp.asarray(
            (rng.standard_normal((h, n)) * 0.02 * np.exp(-0.0001 * np.arange(n)))
            .astype(np.float32)
        )
        y_ref = fft_conv_reference(n, u, k)
        with mesh:
            y = jax.jit(
                lambda u, k: seq_fft_conv(
                    u, k, mesh, axis="sp", compute_dtype=jnp.float32,
                    impl="pallas",
                )
            )(u, k)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-3)


def test_seq_conv_pallas_single_device_mesh(rng):
    """1-device mesh (the hardware case the driver's single chip can run):
    shard_map degenerates to identity all_to_alls around the fused kernel."""
    from flashfftconv_tpu.ops.monarch_xla import fft_conv_reference
    from flashfftconv_tpu.parallel.seq_conv import seq_fft_conv
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("sp",))
    n, b, h = 2048, 2, 4
    u = jnp.asarray(rng.standard_normal((b, h, n)).astype(np.float32) * 0.02)
    k = jnp.asarray(rng.standard_normal((h, n)).astype(np.float32) * 0.02)
    y_ref = fft_conv_reference(n, u, k)
    with mesh:
        y = jax.jit(
            lambda u, k: seq_fft_conv(
                u, k, mesh, axis="sp", compute_dtype=jnp.float32, impl="pallas"
            )
        )(u, k)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)


# ---------------------------------------------------------------------------
# Pipeline parallelism (parallel/pipeline.py) — BEYOND the reference, which
# has no pipeline parallelism anywhere (SURVEY.md §2.6).
# ---------------------------------------------------------------------------


@needs_multi
class TestPipeline:
    def _stages(self, rng, s, d):
        ws = [jnp.asarray(rng.standard_normal((d, d)).astype(np.float32) * 0.3)
              for _ in range(s)]
        bs = [jnp.asarray(rng.standard_normal((d,)).astype(np.float32) * 0.1)
              for _ in range(s)]
        from flashfftconv_tpu.parallel.pipeline import stack_stage_params

        stacked = stack_stage_params(
            [{"w": w, "b": b} for w, b in zip(ws, bs)]
        )
        fn = lambda p, x: jnp.tanh(x @ p["w"] + p["b"])
        return stacked, fn, ws, bs

    def test_forward_and_grad_parity(self, rng):
        from flashfftconv_tpu.parallel.pipeline import pipeline_apply

        s, d = 4, 16
        mesh = make_mesh((s,), ("pp",), devices=jax.devices()[:s])
        stacked, fn, ws, bs = self._stages(rng, s, d)
        x = jnp.asarray(rng.standard_normal((8, d)).astype(np.float32))
        ref = x
        for w, b in zip(ws, bs):
            ref = jnp.tanh(ref @ w + b)
        y = jax.jit(
            lambda sp, x: pipeline_apply(fn, sp, x, mesh, num_microbatches=4)
        )(stacked, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-6)

        def loss_pipe(sp, x):
            return jnp.sum(pipeline_apply(fn, sp, x, mesh) ** 2)

        def loss_seq(sp, x):
            h = x
            for i in range(s):
                h = fn(jax.tree.map(lambda a: a[i], sp), h)
            return jnp.sum(h ** 2)

        g1 = jax.jit(jax.grad(loss_pipe))(stacked, x)
        g2 = jax.jit(jax.grad(loss_seq))(stacked, x)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_dp_pp_composition(self, rng):
        """Each dp group pipelines its own batch shard; result matches the
        unsharded sequential stack exactly."""
        from flashfftconv_tpu.parallel.pipeline import pipeline_apply

        s, d = 4, 16
        mesh = make_mesh((2, s), ("dp", "pp"))
        stacked, fn, ws, bs = self._stages(rng, s, d)
        x = jnp.asarray(rng.standard_normal((8, d)).astype(np.float32))
        ref = x
        for w, b in zip(ws, bs):
            ref = jnp.tanh(ref @ w + b)
        y = jax.jit(
            lambda sp, x: pipeline_apply(
                fn, sp, x, mesh, batch_axis="dp", num_microbatches=2
            )
        )(stacked, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-6)

    def test_lm_blocks_pipelined(self, rng):
        """Real LM blocks (hyena mixer + FFT conv) as pipeline stages: the
        residual-stream segment of ConvLMHeadModel distributed over pp=4."""
        from flashfftconv_tpu.models.lm import Block
        from flashfftconv_tpu.parallel.pipeline import (
            pipeline_apply,
            stack_stage_params,
        )

        s, b, l, d = 4, 4, 64, 16
        mesh = make_mesh((s,), ("pp",), devices=jax.devices()[:s])
        block = Block(
            d_model=d, d_inner=2 * d, mixer="hyena",
            mixer_kwargs={"l_max": l, "impl": "xla",
                          "conv_dtype": jnp.float32},
        )
        x = jnp.asarray(rng.standard_normal((b, l, d)).astype(np.float32))
        keys = jax.random.split(jax.random.PRNGKey(0), s)
        stage_trees = [block.init(keys[i], x)["params"] for i in range(s)]
        stacked = stack_stage_params(stage_trees)

        def stage_fn(p, h):
            return block.apply({"params": p}, h, deterministic=True)

        ref = x
        for p in stage_trees:
            ref = stage_fn(p, ref)
        y = jax.jit(
            lambda sp, x: pipeline_apply(stage_fn, sp, x, mesh)
        )(stacked, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-4)


# ---------------------------------------------------------------------------
# Mixture-of-Experts + expert parallelism (models/moe.py) — BEYOND the
# reference, which has no MoE/expert parallelism (SURVEY.md §2.6).
# ---------------------------------------------------------------------------


@needs_multi
class TestExpertParallel:
    def test_ep_sharded_matches_replicated(self, rng):
        from flashfftconv_tpu.models.moe import MoEMlp, moe_param_shardings

        b, l, d, f, e = 2, 16, 8, 32, 4
        x = jnp.asarray(rng.standard_normal((b, l, d)).astype(np.float32))
        mesh = make_mesh((2, 4), ("dp", "ep"))
        m = MoEMlp(d_model=d, d_inner=f, n_experts=e, top_k=2,
                   capacity_factor=8.0, ep_axis="ep")
        variables = m.init(jax.random.PRNGKey(0), x)
        sh = moe_param_shardings(mesh, variables["params"])
        specs = {
            jax.tree_util.keystr(p): s.spec
            for p, s in jax.tree_util.tree_flatten_with_path(sh)[0]
        }
        assert specs["['w1']"] == P("ep", None, None)
        assert specs["['gate']['kernel']"] == P()
        params_sh = jax.device_put(variables["params"], sh)
        with jax.sharding.set_mesh(mesh):
            y_ep = jax.jit(lambda p, x: m.apply({"params": p}, x))(params_sh, x)
        y_ref = m.apply(variables, x)
        np.testing.assert_allclose(
            np.asarray(y_ep), np.asarray(y_ref), atol=1e-6
        )

    def test_moe_lm_train_step_dp_ep(self, rng):
        """ConvLMHeadModel with an MoE FFN trains one step on a dp x ep mesh
        with expert weights sharded: loss finite, grads flow to experts."""
        import optax

        from flashfftconv_tpu.models.lm import ConvLMHeadModel
        from flashfftconv_tpu.models.moe import moe_param_shardings

        mesh = make_mesh((2, 4), ("dp", "ep"))
        model = ConvLMHeadModel(
            d_model=16, n_layer=2, d_inner=32, vocab_size=32, l_max=32,
            mixer="hyena",
            mixer_kwargs={"impl": "xla", "conv_dtype": jnp.float32},
            moe_kwargs={"n_experts": 4, "top_k": 1, "ep_axis": "ep"},
            dtype=jnp.float32,
        )
        ids = jnp.asarray(rng.integers(0, 32, (4, 32)), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids)["params"]
        sh = moe_param_shardings(mesh, params)
        params = jax.device_put(params, sh)
        ids = jax.device_put(ids, batch_sharding(mesh, 2))
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)

        def loss_fn(p, ids):
            logits = model.apply({"params": p}, ids)
            tgt = jnp.roll(ids, -1, axis=-1)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits[:, :-1], tgt[:, :-1]
            ).mean()

        @jax.jit
        def step(p, o, ids):
            loss, g = jax.value_and_grad(loss_fn)(p, ids)
            updates, o = tx.update(g, o, p)
            return optax.apply_updates(p, updates), o, loss

        with jax.sharding.set_mesh(mesh):
            new_params, opt_state, loss = step(params, opt_state, ids)
            jax.block_until_ready(loss)
        assert np.isfinite(float(loss))
        # experts received gradient updates
        old = dict(jax.tree_util.tree_flatten_with_path(params)[0])
        moved = any(
            "w1" in jax.tree_util.keystr(p)
            and not np.allclose(np.asarray(a), np.asarray(old[p]))
            for p, a in jax.tree_util.tree_flatten_with_path(new_params)[0]
        )
        assert moved


@needs_multi
def test_gpt_tp_sharded_matches_single(rng):
    """GPT (attention) forward + train step over a dp x tp mesh matches the
    unsharded computation — the reference's torchrun
    tests/models/test_gpt_parallel.py (world_size 8) done as one-process
    GSPMD: qkv/fc1 column-parallel, out_proj/fc2 row-parallel."""
    import optax

    from flashfftconv_tpu.models.gpt import GPTLMHeadModel

    model = GPTLMHeadModel(
        d_model=32, n_layer=2, d_inner=64, vocab_size=64, l_max=32,
        num_heads=4, embed_dropout=0.0, resid_dropout=0.0, dtype=jnp.float32,
    )
    ids = jnp.asarray(rng.integers(0, 64, size=(8, 32)))
    params = model.init(jax.random.PRNGKey(0), ids)["params"]
    logits_single = model.apply({"params": params}, ids)

    mesh = make_mesh((2, 4), ("dp", "tp"))
    shardings = param_shardings(mesh, params)
    # the TP rules must actually fire on the attention/MLP kernels
    qkv = shardings["block_0"]["mixer"]["qkv_proj"]["kernel"]
    fc2 = shardings["block_0"]["mixer"]["out_proj"]["kernel"]
    assert qkv.spec == P(None, "tp") and fc2.spec == P("tp", None)

    params_sh = jax.device_put(params, shardings)
    ids_sh = jax.device_put(ids, batch_sharding(mesh, 2))
    with mesh:
        logits = jax.jit(lambda p, i: model.apply({"params": p}, i))(params_sh, ids_sh)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(logits_single), atol=2e-4, rtol=1e-4
    )

    # one sharded train step: finite loss, params keep their shardings
    tx = optax.adamw(1e-3)
    opt_state = jax.device_put(tx.init(params), jax.tree.map(
        lambda _: NamedSharding(mesh, P()), tx.init(params)))

    def loss_fn(p, i):
        lg = model.apply({"params": p}, i)
        return optax.softmax_cross_entropy_with_integer_labels(
            lg[:, :-1], i[:, 1:]
        ).mean()

    @jax.jit
    def step(p, o, i):
        loss, g = jax.value_and_grad(loss_fn)(p, i)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, loss

    with mesh:
        p2, _, loss = step(params_sh, opt_state, ids_sh)
    assert np.isfinite(float(loss))
    assert p2["block_0"]["mixer"]["qkv_proj"]["kernel"].sharding.spec == P(None, "tp")
