"""Test configuration: run on CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4).

Note: this environment's sitecustomize registers the axon TPU backend at
interpreter startup (before conftest), so env vars alone are too late —
jax.config.update after import is what actually forces CPU here.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8
