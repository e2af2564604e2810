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

# The env vars above are read by jax at IMPORT time; an accelerator-plugin
# sitecustomize (e.g. the axon PJRT plugin's) may have imported jax at
# interpreter startup, before this conftest ran — in that case only the
# config API still works. Both paths are needed for the suite to select
# the forced-8-device CPU mesh regardless of the host environment.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
