"""Test environment: force CPU with 8 virtual devices so pjit/shard_map
paths are exercised without TPU hardware.

The image's axon sitecustomize programmatically sets jax_platforms at
interpreter start, so env vars alone don't stick — the config update below
(before any backend is initialized) is what actually selects CPU.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
