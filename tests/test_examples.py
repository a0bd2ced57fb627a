"""Smoke tests for the example training scripts (tiny configs, CPU).

The reference treats its benchmarks/examples as smoke tests (SURVEY.md §4);
here each example runs a few steps end to end in a subprocess."""

import os
import subprocess
import sys

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
