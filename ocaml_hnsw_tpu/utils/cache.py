"""Persistent XLA compile cache, gated to TPU-family backends.

The cold driver-protocol bench pays ~200 s of remote compile inside one 1M
build (measured round 3: cold 370.5 s vs warm 167.4 s at identical knobs).
With the persistent cache a fresh process reloads those executables from
disk: the 3k-point probe build dropped 127 s -> 14.1 s.

Two machine-specific hazards shape the gating:
  * XLA:CPU AOT reload SEGFAULTS here (cpu_aot_loader machine-feature
    mismatch, "+prefer-no-gather ... could lead to SIGILL" — observed), so
    the cache must never be enabled on the CPU backend (tests run CPU).
  * The axon tunnel had a libtpu AOT version-mismatch failure mode in
    round 1.  bench.py therefore re-execs itself and retries cache-less on
    abnormal child exit rather than trusting the cache blindly.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jaxcache",
)


def enable_persistent_cache(cache_dir: str | None = None) -> bool:
    """Turn on the JAX persistent compilation cache iff the active backend
    is not CPU.  Returns True when enabled.  Safe to call after backend
    initialization (the cache is consulted per-compile)."""
    import jax

    if os.environ.get("OHNSW_NO_COMPILE_CACHE") == "1":
        return False
    if jax.devices()[0].platform == "cpu":
        return False
    path = cache_dir or DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return True
