"""Test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware
(XLA_FLAGS=--xla_force_host_platform_device_count=8).

Note: the environment's sitecustomize imports jax at interpreter start with
JAX_PLATFORMS=axon (the real TPU tunnel), so we must override via
jax.config, not just the env var.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# The persistent-cache AOT loader logs a full ISA-feature dump whenever a
# cached executable was compiled under slightly different tuning prefs
# (prefer-no-scatter/gather) — harmless, but it drowns test output.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the suite is compile-dominated on a
# single-core host (~11 min cold), and most of that is re-compiling the
# same integration-test programs every run. Cache XLA executables on disk
# so repeated runs (the per-commit gate) skip compilation entirely.
# Override the location with FOURIERFLOW_TEST_JAX_CACHE; delete the
# directory to force a cold run.
_cache_dir = os.environ.get(
    "FOURIERFLOW_TEST_JAX_CACHE",
    os.path.join(os.path.dirname(__file__), ".jax_cache"),
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

assert jax.devices()[0].platform == "cpu"
