"""Tests for aux subsystems: registry, metrics, fault-tolerant sampler,
optimizer groups, checkpointing, benchmarking helpers, generation."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashfftconv_tpu.utils.data import FaultTolerantSampler, ShardedSampler, lm_batches
from flashfftconv_tpu.utils.metrics import (
    accuracy,
    cross_entropy,
    global_norm,
    num_tokens,
    perplexity,
)
from flashfftconv_tpu.utils.optim import make_optimizer
from flashfftconv_tpu.utils.registry import instantiate, lookup, register


def test_registry_lookup_and_instantiate():
    cls = lookup("layer", "hyena")
    from flashfftconv_tpu.models.hyena import HyenaOperator

    assert cls is HyenaOperator
    layer = instantiate("layer", {"_name_": "hyena", "d_model": 8, "l_max": 16})
    assert layer.d_model == 8
    with pytest.raises(KeyError):
        lookup("layer", "nope")
    register("layer", "custom", lambda **kw: kw)
    assert instantiate("layer", "custom") == {}


def test_metrics():
    logits = jnp.asarray([[[2.0, 0.0, 0.0], [0.0, 2.0, 0.0]]])
    targets = jnp.asarray([[0, 1]])
    assert float(accuracy(logits, targets)) == 1.0
    ce = float(cross_entropy(logits, targets))
    assert 0 < ce < 1
    assert abs(float(perplexity(logits, targets)) - np.exp(ce)) < 1e-4
    assert int(num_tokens(targets, ignore_index=1)) == 1
    # ignore_index masks correctly
    t2 = jnp.asarray([[0, 2]])
    assert float(accuracy(logits, t2, ignore_index=2)) == 1.0


def test_fault_tolerant_sampler_resume():
    s = FaultTolerantSampler(num_samples=10, seed=3)
    it = iter(s)
    first = [next(it) for _ in range(4)]
    state = s.state_dict()

    s2 = FaultTolerantSampler(num_samples=10, seed=3)
    s2.load_state_dict(state)
    rest_resumed = list(s2)

    s3 = FaultTolerantSampler(num_samples=10, seed=3)
    full = list(s3)
    assert first + rest_resumed == full  # resume continues mid-epoch exactly


def test_sharded_sampler_partition():
    idx = set()
    for rank in range(4):
        s = ShardedSampler(num_samples=16, seed=0, rank=rank, world_size=4)
        part = list(s)
        assert len(part) == 4
        idx.update(part)
    assert len(idx) == 16  # disjoint cover


def test_lm_batches():
    toks = np.arange(100)
    gen = lm_batches(toks, batch_size=2, seq_len=8, rng=np.random.default_rng(0))
    x, y = next(gen)
    assert x.shape == (2, 8) and y.shape == (2, 8)
    np.testing.assert_array_equal(x + 1, y)


def test_optimizer_groups_separate_lr():
    params = {
        "layer_0": {"kernel": jnp.ones((4, 4)), "D": jnp.ones((4,))},
        "encoder": {"kernel": jnp.ones((4, 4))},
    }
    # kernel-labeled leaves get their own transform; a zero special lr
    # freezes them while others move.
    tx = make_optimizer(params, lr=0.1, weight_decay=0.0, special_lr=0.0)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["layer_0"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(updates["layer_0"]["D"]).max()) > 0.0


def test_checkpoint_roundtrip(tmp_path):
    import optax

    from flashfftconv_tpu.utils.train import (
        TrainState,
        create_train_state,
        restore_checkpoint,
        save_checkpoint,
    )

    params = {"w": jnp.arange(4.0)}
    tx = optax.adam(1e-3)
    state = create_train_state(params, tx)
    save_checkpoint(str(tmp_path / "ckpt"), state, {"epoch": 7, "acc": 0.5})
    state2 = create_train_state({"w": jnp.zeros(4)}, tx)
    restored, extra = restore_checkpoint(str(tmp_path / "ckpt"), state2, {"epoch": 0, "acc": 0.0})
    np.testing.assert_array_equal(np.asarray(restored.params["w"]), np.arange(4.0))
    assert int(extra["epoch"]) == 7


def test_benchmark_helpers():
    from flashfftconv_tpu.utils.benchmarking import (
        benchmark_forward,
        benchmark_memory,
        flops_estimate,
    )

    f = lambda x: x @ x
    x = jnp.ones((64, 64))
    ms = benchmark_forward(f, x, repeats=2, warmup=1)
    assert ms > 0
    fl = flops_estimate(f, x)
    assert fl > 0 or np.isnan(fl)
    mb = benchmark_memory(f, x)
    assert mb > 0 or np.isnan(mb)


def test_generation():
    from flashfftconv_tpu.models.lm import ConvLMHeadModel
    from flashfftconv_tpu.utils.generation import generate

    vocab, L = 16, 32
    model = ConvLMHeadModel(
        d_model=16, n_layer=1, d_inner=32, vocab_size=vocab, l_max=L,
        mixer="hyena", mixer_kwargs={"conv_dtype": jnp.float32, "impl": "xla"},
        dtype=jnp.float32,
    )
    ids = jnp.asarray(np.random.default_rng(0).integers(0, vocab, (2, 4)))
    params = model.init(jax.random.PRNGKey(0), ids)["params"]
    out = generate(model.apply, params, ids, max_new_tokens=3, max_length=L,
                   temperature=1.0, top_k=4)
    assert out.shape == (2, 7)
    np.testing.assert_array_equal(np.asarray(out[:, :4]), np.asarray(ids))
    # greedy determinism
    g1 = generate(model.apply, params, ids, 3, L, temperature=0.0)
    g2 = generate(model.apply, params, ids, 3, L, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_metric_logger(tmp_path):
    from flashfftconv_tpu.utils.logging import MetricLogger

    lg = MetricLogger(logdir=str(tmp_path), run_name="t")
    lg.log({"loss": jnp.asarray(1.5)}, step=0)
    lg.log({"loss": 1.0}, step=1)
    lines = open(tmp_path / "t.jsonl").read().strip().splitlines()
    assert len(lines) == 2
    import json

    assert json.loads(lines[0])["loss"] == 1.5


def test_debugging_helpers():
    from flashfftconv_tpu.utils.debugging import assert_finite, checked

    assert_finite({"a": jnp.ones(3)})
    with pytest.raises(FloatingPointError):
        assert_finite({"a": jnp.asarray([1.0, float("nan")])}, name="params")

    f = checked(lambda x: jnp.log(x))
    assert np.isfinite(float(f(jnp.asarray(2.0))))
    with pytest.raises(Exception):
        f(jnp.asarray(-1.0))  # nan from log of negative


def test_auto_save_on_exception(tmp_path):
    """Crash-time checkpoint hook (reference ModelCheckpointMine.on_exception,
    training/src/callbacks/model_checkpoint.py:8-17) + resume preferring the
    newer auto-save (training/src/train.py:69-92)."""
    import optax

    from flashfftconv_tpu.utils.train import (
        auto_save_on_exception,
        create_train_state,
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )

    params = {"w": jnp.ones((4, 4))}
    tx = optax.sgd(1e-2)
    state = create_train_state(params, tx)

    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir + "/last", state, {"epoch": 0})

    bumped = type(state)(
        step=state.step + 7, params=state.params, opt_state=state.opt_state
    )
    with pytest.raises(RuntimeError):
        with auto_save_on_exception(ckpt_dir) as guard:
            guard.track(bumped, extra={"epoch": 3})
            raise RuntimeError("boom")

    newest = latest_checkpoint(ckpt_dir)
    assert newest is not None and newest.endswith("auto_save")
    restored, extra = restore_checkpoint(newest, state, {"epoch": 0})
    assert int(restored.step) == 7
    assert extra["epoch"] == 3

    # No crash -> no auto-save rewrite; latest prefers whichever is newer.
    with auto_save_on_exception(ckpt_dir) as guard:
        guard.track(state)


def test_ema(rng):
    """Parameter EMA (the reference's EMACallback, ema.py:16)."""
    from flashfftconv_tpu.utils.optim import ema_init, ema_swap, ema_update

    p0 = {"w": jnp.ones((4,), jnp.bfloat16)}
    ema = ema_init(p0)
    assert ema["w"].dtype == jnp.float32
    ema = ema_update(ema, {"w": jnp.zeros((4,), jnp.bfloat16)}, decay=0.5)
    np.testing.assert_allclose(np.asarray(ema["w"]), 0.5)
    swapped = ema_swap(ema, p0)
    assert swapped["w"].dtype == jnp.bfloat16


def test_scheduler_registry():
    from flashfftconv_tpu.utils.registry import instantiate

    s = instantiate("scheduler", {"_name_": "linear", "init_value": 1.0,
                                  "end_value": 0.0, "transition_steps": 10})
    assert abs(float(s(5)) - 0.5) < 1e-6
    s2 = instantiate("scheduler", {"_name_": "exponential", "init_value": 1.0,
                                   "transition_steps": 10, "decay_rate": 0.5})
    assert float(s2(10)) < 1.0


def test_rms_norm_and_dropout_add(rng):
    import jax
    import jax.numpy as jnp

    from flashfftconv_tpu.ops.fused import dropout_add_rms_norm, rms_norm

    x = jnp.asarray(rng.standard_normal((2, 8, 16)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(16).astype(np.float32))
    out = rms_norm(x, w)
    ref = x / np.sqrt((np.asarray(x) ** 2).mean(-1, keepdims=True) + 1e-5) * np.asarray(w)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    res = jnp.ones_like(x)
    out2, pre = dropout_add_rms_norm(x, res, w, 0.0, deterministic=True, prenorm=True)
    np.testing.assert_allclose(np.asarray(pre), np.asarray(x) + 1.0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(rms_norm(x + res, w)), atol=1e-5
    )


def test_param_counts():
    import jax.numpy as jnp

    from flashfftconv_tpu.utils.metrics import param_counts

    params = {"a": {"w": jnp.zeros((3, 4))}, "b": {"v": jnp.zeros(5)}}
    c = param_counts(params)
    assert c["total"] == 17 and c["a"] == 12 and c["b"] == 5


def test_causality_leakage(rng):
    """A causal conv leaks nothing forward; a bidirectional mix does."""
    import jax.numpy as jnp

    from flashfftconv_tpu.utils.debugging import causality_leakage

    x = jnp.asarray(rng.standard_normal((1, 16, 4)).astype(np.float32))

    def causal(x):  # causal cumulative sum over time
        return jnp.cumsum(x, axis=1)

    def acausal(x):  # sees the future
        return x + jnp.flip(x, axis=1)

    assert all(v == 0.0 for v in causality_leakage(causal, x).values())
    assert max(causality_leakage(acausal, x).values()) > 0.1


def test_top_p_sampling_filters_tail(rng):
    """top_p keeps only the nucleus: with a sharply peaked distribution and
    small top_p, sampling always returns the argmax."""
    import jax
    from flashfftconv_tpu.utils.generation import sample_logits

    logits = jnp.asarray([[5.0, 1.0, 0.5, 0.0]])
    for seed in range(8):
        tok = sample_logits(jax.random.PRNGKey(seed), logits,
                            temperature=1.0, top_p=0.5)
        assert int(tok[0]) == 0
    # top_p=1-eps keeps everything: over many draws other tokens appear
    seen = {int(sample_logits(jax.random.PRNGKey(s),
                              jnp.asarray([[0.1, 0.0, 0.0, 0.0]]),
                              temperature=2.0, top_p=0.999)[0])
            for s in range(64)}
    assert len(seen) > 1


def test_compile_cache_opt_in(tmp_path, monkeypatch):
    """enable_compilation_cache: no-op when the env var is unset, sets the
    jax config to the requested directory when given one explicitly."""
    import jax
    from flashfftconv_tpu.utils.compile_cache import enable_compilation_cache

    monkeypatch.delenv("FLASHFFTCONV_COMPILE_CACHE", raising=False)
    assert enable_compilation_cache() is False

    cache_dir = str(tmp_path / "xla-cache")
    assert enable_compilation_cache(cache_dir) is True
    assert jax.config.jax_compilation_cache_dir == cache_dir
    import os
    assert os.path.isdir(cache_dir)
    # restore: don't leak a tmp cache dir into later tests in this process
    jax.config.update("jax_compilation_cache_dir", None)
