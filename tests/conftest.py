"""Test configuration: run on an 8-virtual-device CPU mesh by default.

The reference only tests on real GPUs (SURVEY.md §4); the idiomatic TPU/JAX
equivalent is a host-platform mesh so sharding/parity tests run anywhere.
Set FLASHFFTCONV_TEST_TPU=1 to run the suite on the attached TPU instead
(single chip; sharding tests then skip if fewer than 2 devices).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

if not os.environ.get("FLASHFFTCONV_TEST_TPU"):
    # The axon sitecustomize registers the TPU backend eagerly; overriding the
    # config (not the env var) after import still works.
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
