"""Test bootstrap: force the CPU backend with a virtual 8-device mesh so every
test (including the sharded-index tests) runs without TPU hardware
(SURVEY.md §4: "host-count simulation via xla_force_host_platform_device_count").

Must set the env vars before jax is imported anywhere.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
