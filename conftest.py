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
_platform = os.environ.get("CFA_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(__file__))

import jax  # noqa: E402

# The env-var route above is NOT sufficient when the interpreter's
# sitecustomize imports jax at startup (the tunneled-TPU image does:
# PYTHONPATH=/root/.axon_site imports jax before pytest even loads this
# conftest, with JAX_PLATFORMS=axon latched) — the whole suite then runs
# on the remote chip: slow, and red where Mosaic rejects interpret-mode
# kernels.  jax.config.update still wins as long as no backend has been
# initialized, so pin the platform through the config API too.
jax.config.update("jax_platforms", _platform)

# fp32 means fp32 in tests.  XLA's DEFAULT matmul precision computes larger
# fp32 matmuls in reduced precision on some backends (measured on XLA:CPU:
# [5,128]@[128,128] fp32 -> 6.6e-2 max error vs fp64, while [1,128] GEMV
# stays exact) — which made the plain-decode path (tiny per-token matmuls,
# exact) drift up to 8.6e-3 from the speculative verify path (batched chunk
# matmuls, reduced) in a pure-fp32 model.  Pallas kernels are unaffected
# (they pass explicit precision); this pins the surrounding model math.
jax.config.update("jax_default_matmul_precision", "highest")
