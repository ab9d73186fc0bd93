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

# Persistent compilation cache: DISABLED for the suite.  XLA:CPU AOT
# executable (de)serialization is unreliable on this machine class —
# entries written on a host with different CPU features SIGILL on load,
# and serialization itself can abort() the test process mid-suite (both
# observed in round 4: "Loading XLA:CPU AOT result ... SIGILL" /
# "Fatal Python error: Aborted in put_executable_and_time").  Cold
# compiles cost wall-clock but never crash the suite.


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running integration test")
