"""Test bootstrap: force the CPU backend with a virtual 8-device mesh so every
test (including the sharded-index tests) runs without TPU hardware
(SURVEY.md §4: "host-count simulation via xla_force_host_platform_device_count").

This machine presets JAX_PLATFORMS=axon and a sitecustomize that registers the
axon (remote TPU tunnel) backend at interpreter startup, so env vars set here
are too late — override through jax.config before any backend initializes.
Running tests through the tunnel would pay a network round-trip per op.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NOTE: the JAX persistent compilation cache was tried here and REVERTED:
# XLA:CPU AOT reload segfaults on this machine (cpu_aot_loader machine-feature
# mismatch, "+prefer-no-gather ... could lead to SIGILL" — and it did).

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _free_jax_executables():
    """XLA:CPU's LLVM JIT segfaults after enough live compiled executables
    accumulate in one process on this machine (observed deterministically
    ~30 tests into the suite, in backend_compile_and_load; each test passes
    in isolation).  Dropping jit caches between modules avoids the crash at
    the cost of cross-module recompiles."""
    yield
    jax.clear_caches()
