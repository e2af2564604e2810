"""Test configuration: run everything on CPU with 8 forced virtual devices
(the JAX-ecosystem trick for multi-device tests without a cluster —
SURVEY.md §4 item 3) and float64 enabled for ≤1e-10 parity checks.

Must set env vars before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
