"""Test configuration: hermetic CPU backend with 8 virtual devices.

Must run before jax is imported anywhere: forces the CPU platform (tests
never depend on TPU availability; Pallas kernels auto-select interpret mode
off-TPU) and exposes 8 virtual devices so the shard_map/collective paths —
the multi-chip design — execute end-to-end (SURVEY.md §4).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: driver env may point at TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Site customization (e.g. an accelerator plugin registered from
# sitecustomize) may import jax before this file runs, making the env vars
# above ineffective; jax.config still works pre-backend-initialization.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
