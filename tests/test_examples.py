"""Smoke tests for the example training scripts (tiny configs, CPU).

The reference treats its benchmarks/examples as smoke tests (SURVEY.md §4);
here each example runs a few steps end to end in a subprocess."""

import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
ENV = {
    **os.environ,
    "PALLAS_AXON_POOL_IPS": "",
    "JAX_PLATFORMS": "cpu",
    "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
}


def _run(args, timeout=300):
    return subprocess.run(
        [sys.executable, *args], cwd=ROOT, env=ENV, timeout=timeout,
        capture_output=True, text=True,
    )


@pytest.mark.slow
def test_cifar_example():
    r = _run(
        ["examples/cifar/train.py", "--epochs", "1", "--synthetic",
         "--d_model", "32", "--n_layers", "1", "--batch_size", "32",
         "--limit-batches", "2"]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "val acc" in r.stdout


@pytest.mark.slow
def test_lm_example():
    r = _run(
        ["examples/lm/train.py", "--steps", "3", "--d_model", "32",
         "--n_layer", "1", "--l_max", "128", "--batch_size", "4",
         "--impl", "xla", "--log-every", "1"]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "sample:" in r.stdout


@pytest.mark.slow
def test_bert_example():
    r = _run(
        ["examples/bert/train.py", "--steps", "3", "--d_model", "32",
         "--n_layer", "1", "--batch_size", "4", "--impl", "xla"]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "mlm loss" in r.stdout


@pytest.mark.slow
def test_lra_listops_example(tmp_path):
    r = _run(
        ["examples/lra/train_listops.py", "--epochs", "1", "--n-train", "64",
         "--n-val", "32", "--batch_size", "32", "--l-max", "256",
         "--d_model", "32", "--n_layers", "1",
         "--data-cache", str(tmp_path / "listops.npz"),
         "--ckpt-dir", str(tmp_path / "ckpt")]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "val acc" in r.stdout


@pytest.mark.slow
def test_lra_pathfinder_example(tmp_path):
    r = _run(
        ["examples/lra/train_pathfinder.py", "--epochs", "1", "--n-train",
         "64", "--n-val", "32", "--batch_size", "32", "--d_model", "32",
         "--n_layers", "1",
         "--data-cache", str(tmp_path / "pathfinder.npz"),
         "--ckpt-dir", str(tmp_path / "ckpt")]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "val acc" in r.stdout


@pytest.mark.slow
def test_lra_retrieval_example(tmp_path):
    r = _run(
        ["examples/lra/train_retrieval.py", "--epochs", "1", "--n-train",
         "64", "--n-val", "32", "--batch_size", "16", "--l-max", "256",
         "--d_model", "32", "--n_layers", "1",
         "--data-cache", str(tmp_path / "retrieval.npz"),
         "--ckpt-dir", str(tmp_path / "ckpt")]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "val acc" in r.stdout


@pytest.mark.slow
def test_forecasting_example(tmp_path):
    r = _run(
        ["examples/forecasting/train_ett.py", "--epochs", "1", "--n-steps",
         "2000", "--l-max", "256", "--horizon", "24", "--batch_size", "16",
         "--d_model", "32", "--n_layers", "1",
         "--ckpt-dir", str(tmp_path / "ckpt")]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "val mse" in r.stdout


def test_ett_generator_properties():
    sys.path.insert(0, os.path.join(ROOT, "examples", "forecasting"))
    from train_ett import N_CHANNELS, build_series, make_windows

    s = build_series(1000, seed=0)
    assert s.shape == (1000, N_CHANNELS)
    # standardized per channel
    np.testing.assert_allclose(s.mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(s.std(0), 1.0, atol=1e-4)
    # strong daily seasonality: autocorrelation at lag 24 well above lag 17
    def acorr(x, lag):
        return float(np.mean(x[:-lag] * x[lag:]))
    assert acorr(s[:, 0], 24) > acorr(s[:, 0], 17) + 0.05
    xs, ys = make_windows(s, l_in=64, horizon=8, stride=4)
    assert xs.shape[1:] == (64, N_CHANNELS) and ys.shape[1:] == (8, N_CHANNELS)
    # windows and targets are contiguous in time
    np.testing.assert_array_equal(xs[1], s[4:68])
    np.testing.assert_array_equal(ys[1], s[68:76])


def test_pathfinder_generator_properties():
    sys.path.insert(0, os.path.join(ROOT, "examples", "lra"))
    from train_pathfinder import MARK_VAL, SIDE, build_dataset

    x, y = build_dataset(16, seed=0)
    assert x.shape == (16, SIDE * SIDE) and set(np.unique(y)) == {0, 1}
    # every image has exactly two endpoint markers (3x3 bright blobs can
    # merge if close; require at least one bright pixel and dashes)
    for img in x:
        assert (img == MARK_VAL).sum() >= 4          # markers present
        assert ((img > 0) & (img < MARK_VAL)).sum() > 20  # dashes present
    # classes must have matched marker-distance statistics (anti-shortcut):
    # mean pixel mass should not separate the classes strongly
    m0, m1 = x[y == 0].mean(), x[y == 1].mean()
    assert abs(m0 - m1) / max(m0, m1) < 0.2


def test_retrieval_generator_properties():
    sys.path.insert(0, os.path.join(ROOT, "examples", "lra"))
    from train_retrieval import VOCAB, build_dataset

    x1, x2, y = build_dataset(8, l=128, seed=0)
    assert x1.shape == x2.shape == (8, 128)
    assert x1.max() < VOCAB and x1.min() >= 0
    # positives must overlap with their pair far more than negatives
    pos = (x1[y == 1] == x2[y == 1]).mean()
    neg = (x1[y == 0] == x2[y == 0]).mean()
    assert pos > neg + 0.2, (pos, neg)


@pytest.mark.slow
def test_seq_parallel_example():
    env = {**ENV, "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    r = subprocess.run(
        [sys.executable, "examples/seq_parallel/train_ultra_long.py",
         "--l-max", "2048", "--steps", "2", "--d_model", "16",
         "--n_layers", "1"],
        cwd=ROOT, env=env, timeout=600, capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "final loss" in r.stdout


@pytest.mark.slow
def test_hyena_dna_example():
    r = _run(
        ["examples/hyena_dna/train.py", "--steps", "2", "--d_model", "32",
         "--n_layer", "1", "--l_max", "512", "--impl", "xla"]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "bits/base" in r.stdout
