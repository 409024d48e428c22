"""Test harness config.

Tests run on a virtual 8-device CPU mesh (the TPU-native substitute for
the reference's nonexistent fake backends — SURVEY.md §4).

This environment's sitecustomize registers the axon TPU backend in
every python process and forces jax_platforms='axon,cpu'; we override
to CPU *in process* before any backend is initialized so test runs
never contend for the single TPU chip.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# f32 precision for parity tests.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
