"""Test configuration: force the CPU backend with 8 virtual devices.

Must run before jax initializes a backend (SURVEY.md §4 "fake/offline
backends": multi-chip sharding is tested on a virtual CPU mesh).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
