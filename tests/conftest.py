"""Test configuration: CPU backend with 8 virtual devices, x64 enabled.

SURVEY.md §4.4: the TPU analog of a fake multi-node backend is
``--xla_force_host_platform_device_count`` on CPU — sharding and
collective logic run on 8 virtual devices without hardware.  x64 gives
the solvers f64 accumulation so 1e-8-residual acceptance tests are
meaningful.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# NOTE: the TPU-tunnel ("axon") jax plugin in this image ignores the
# JAX_PLATFORMS environment variable; the config update is authoritative.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite is compile-bound on CPU, and
# topology-static shapes mean near-total cache hits on re-runs.  The
# cache directory is keyed by a machine/backend fingerprint so artifacts
# compiled elsewhere are never loaded (see fea_tpu/utils/cache.py).
import sys  # noqa: E402

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
from fea_tpu.utils.cache import setup_compilation_cache  # noqa: E402

setup_compilation_cache(os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache")))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260816)
