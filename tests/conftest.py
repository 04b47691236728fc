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


# --------------------------------------------------------------------------
# Cross-run build cache: BuildState.add() on the CPU backend is the single
# biggest suite cost (compile + ~n/R insert rounds per module fixture, paid
# again after every clear_caches).  Modules request a built graph through
# this helper; the constructed GraphTensors is persisted to
# .pytest_cache/graphs/<key>.npz via the real checkpoint codec, so repeat
# runs (and other modules wanting the same shape) load in milliseconds.
# Keys encode every build input — bump _CACHE_TAG when the builder's
# semantics change so stale graphs are never reused.
_CACHE_TAG = "v1"


def built_state_cached(key: str, config, n: int, data, round_size: int):
    """BuildState over `data`, loaded from the on-disk cache when possible.

    Returns a fresh BuildState that ADOPTED the cached graph (host mirrors,
    seed bank and RNG stream all rebuilt), which is exactly the
    load_index path users hit — behaviorally equivalent to building."""
    import numpy as np
    from ocaml_hnsw_tpu.models.build import BuildState
    from ocaml_hnsw_tpu.io import save_index_file, load_index_file

    cache_dir = os.path.join(os.path.dirname(__file__), "..", ".pytest_cache",
                             "graphs")
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"{_CACHE_TAG}-{key}.npz")
    if os.path.exists(path):
        graph, cfg, _, rng_state, _, _ = load_index_file(path)
        st = BuildState(cfg, n, round_size=round_size)
        st.adopt_graph(graph)
        if rng_state is not None:
            st.rng.set_state(rng_state)
        return st
    st = BuildState(config, n, round_size=round_size)
    st.add(data)
    save_index_file(path, st.graph, config,
                    np.arange(int(st.graph.n), dtype=np.int64),
                    rng_state=st.rng.get_state())
    return st
