"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding-correctness tests
use XLA's host-platform device virtualization instead (the same mechanism
the driver's dryrun uses).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env may carry 'axon'
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize calls jax.config.update("jax_platforms",
# "axon,cpu") at interpreter start, which SILENTLY OVERRIDES the
# JAX_PLATFORMS env var above.  Tests must never touch the (exclusive,
# single-claim) remote TPU: when no other process holds the claim the
# suite would otherwise run on the TPU — or hang forever in backend init
# on a wedged claim.  Re-force cpu at the config level.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: OPT-IN via ORBTPU_JAX_CACHE (the
# package __init__ reads it).  run_tests.sh sets a MACHINE-FINGERPRINTED
# cache dir + one auto-retry: XLA:CPU AOT entries SIGILL when loaded
# under different CPU features, and XLA:CPU can abort() mid-compile
# (both observed r4/r5) — the fingerprint confines entries to the
# writing machine and the retry rides the warm cache past a crash.
# A bare `pytest tests/` run stays cache-less (slow but crash-free
# compiles).


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running integration test")
