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


# ---------------------------------------------------------------------------
# `-m quick` tier: a ~2-minute signal covering one size per plan arity, one
# kernel path each (fused 2-factor / long / depthwise / attention), and one
# model per family — so the full ~20-minute suite isn't the only option.
# Curated here (rather than decorators scattered across files) so the tier's
# contents are auditable in one place.
QUICK_NODEIDS = {
    # plan math, one per factorization arity
    "test_plan.py::test_default_factors_cover_all_sizes",
    "test_plan.py::test_monarch_dft_matches_fft[4096]",
    "test_plan.py::test_monarch_roundtrip[131072]",
    # fftconv parity: fused 2-factor, gated, long-kernel, module+vjp
    "test_fftconv.py::test_fftconv_plain[bfloat16-1024]",
    "test_fftconv.py::test_fftconv_gated[bfloat16-4096]",
    "test_fftconv.py::test_fftconv_gated_padded[bfloat16-32768]",
    "test_fftconv.py::test_fftconv_long[131072]",
    "test_fftconv.py::test_module_gated_grad_under_jit",
    # pallas kernels (interpret mode on CPU) — one case per kernel family:
    # fused 2-factor, 3-factor grads, 4-level butterfly pipeline, half-band
    "test_pallas.py::test_pallas_forward[False-2048]",
    "test_pallas.py::test_pallas_grads[False-4096]",
    "test_pallas.py::test_pallas_4level_path[524288]",
    "test_pallas.py::test_half_band_path[False-65536-1]",
    # depthwise conv1d
    "test_depthwise.py::test_pallas_path_forward[5-2-True]",
    "test_depthwise.py::test_backward",
    # one model per family
    "test_models.py::test_long_conv_model",
    "test_models.py::test_hyena_operator",
    "test_models.py::test_m2_mixer[True-False]",
    "test_models.py::test_h3_operator[2]",
    "test_models.py::test_lm_head_model[hyena]",
    "test_models.py::test_gpt_lm_forward_and_grad",
    "test_models.py::test_vit_forward_and_grad",
    "test_attention.py::test_flash_mha_fallback_matches_reference",
    "test_attention.py::test_mha_operator_decode_matches_forward",
    "test_sequence.py::test_sequence_model_long_conv_mixer",
    "test_sparse.py::test_partial_via_monarch_plan",
    # parallelism over the 8-device CPU mesh
    "test_parallel.py::test_dp_batch_sharded_conv",
    "test_parallel.py::test_zero1_sharded_optimizer_step",
    "test_parallel.py::TestSeqShardedConv::test_matches_reference_f32",
    # harness infra
    "test_utils.py::test_checkpoint_roundtrip",
    "test_utils.py::test_optimizer_groups_separate_lr",
    "test_native_loader.py::test_shapes_and_shift",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        nodeid = item.nodeid.split("/")[-1]  # strip tests/ prefix
        if nodeid in QUICK_NODEIDS:
            item.add_marker(pytest.mark.quick)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
