"""Test configuration: hermetic CPU backend with 8 virtual devices.

Must run before jax is imported anywhere: forces the CPU platform (tests
never depend on TPU availability; Pallas kernels auto-select interpret mode
off-TPU) and exposes 8 virtual devices so the shard_map/collective paths —
the multi-chip design — execute end-to-end (SURVEY.md §4).
"""
import os
import resource

# XLA:CPU's LLVM pipeline C-stack-overflows (flaky segfault in
# backend_compile_and_load) when compiling the big unrolled merge-engine
# graphs late in the suite, where the Python/pytest stack is already deep.
# The main-thread stack grows on demand up to the soft limit — raise it.
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
_want = 512 * 1024 * 1024
if _soft != resource.RLIM_INFINITY and _soft < _want:
    new = _want if _hard == resource.RLIM_INFINITY else min(_want, _hard)
    resource.setrlimit(resource.RLIMIT_STACK, (new, _hard))

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
