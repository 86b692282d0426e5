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

# Persistent compilation cache. Besides speed, this is a CRASH mitigation:
# the r4/r5 "order-dependent" frame-DP gate failure was root-caused (r5) to
# the single xdist worker dying with a FATAL SIGNAL inside XLA CPU
# compilation after ~170 accumulated in-process compiles (xdist reports the
# crash as a failure of whichever test was running — [std] in the r4 run,
# [entropy] in the r5 repro; the DP-vs-scan equivalence itself is BIT-EXACT
# over 6 isolated repeats). Reusing compiled executables across runs cuts
# the per-run native-compiler churn to near zero.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), os.pardir,
                               ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8
