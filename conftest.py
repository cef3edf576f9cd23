# Root conftest: configure the JAX backend for the test suite BEFORE jax is
# imported anywhere.
#
# Tests run on a virtual 8-device CPU mesh so that multi-chip sharding
# (shard_map / pjit over a Mesh) is exercised without pod hardware, per the
# reference test strategy translation in SURVEY.md §4.  Pallas kernels detect
# the CPU backend and run in interpreter mode automatically.
#
# Override by exporting JAX_PLATFORMS / XLA_FLAGS before invoking pytest
# (e.g. JAX_PLATFORMS=tpu to smoke-test kernels on a real chip).
import os
import sys

# Force CPU regardless of ambient JAX_PLATFORMS (e.g. a TPU tunnel platform);
# set CFA_TEST_PLATFORM to opt out (CFA_TEST_PLATFORM=tpu for on-chip smoke).
os.environ["JAX_PLATFORMS"] = os.environ.get("CFA_TEST_PLATFORM", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(__file__))
