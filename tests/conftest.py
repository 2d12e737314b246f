"""Test configuration.

Tests run on CPU with 8 virtual devices so sharding paths are exercised
without TPU hardware (SURVEY.md §4 takeaway: unlike the reference, which
is untestable without a GPU, everything here must be CPU-testable —
Pallas kernels via interpret mode).
"""

import os

# NOTE: this environment pre-imports jax at interpreter startup
# (sitecustomize) with JAX_PLATFORMS=axon (the tunneled TPU), so env vars
# alone are too late — switch platform via jax.config before any backend
# is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Don't pollute the persistent cache with tiny test executables.
os.environ.setdefault("SFAST_TPU_DISABLE_CACHE", "1")

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

# Build the native _C extension up front so the native-signature suite
# runs it (VERDICT r3 weak #9: it silently skipped in the shipped tree).
# Failure to build leaves the Python fallback; with
# SFAST_TPU_REQUIRE_NATIVE=1 the native test then FAILS instead of
# skipping.
from sfast_tpu.runtime.native_build import ensure_native  # noqa: E402

ensure_native()


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture
def rng():
    return jax.random.key(0)
