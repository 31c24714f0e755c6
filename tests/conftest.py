"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; all sharding tests run against
XLA's host-platform device virtualization (SURVEY.md §4 implication — the
reference has no distributed tests at all; we simulate the mesh on CPU).

Note: this environment pre-imports jax at interpreter startup (axon tunnel
site hook), so JAX_PLATFORMS in os.environ is read too late — we must go
through jax.config.update before any backend initializes.
"""

import os

# XLA flags are parsed at CPU-backend creation, which hasn't happened yet
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

# pin the ENV too: in-process CLI entry points re-assert JAX_PLATFORMS from
# the environment (core.mesh.respect_platform_env), so a shell that pins it
# to the accelerator would otherwise re-point an isolated test run onto the
# tunneled chip the moment a test calls cli.main()/hub.cli.main() before
# anything has initialized the CPU backend — observed as order-dependent
# byte mismatches and pallas-under-shard_map errors when running single
# test files that the full-suite order never hits
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (already in sys.modules; config still mutable)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
