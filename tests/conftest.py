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
# Persistent compilation cache: this machine has ONE cpu core, and the suite's
# wall-clock is dominated by XLA:CPU compiles of the big jitted programs
# (insert_round per mesh size, knn_search per shape).  Caching them across
# test runs cuts repeat runs from ~40 min toward the compile-free floor.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
