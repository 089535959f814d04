"""Test harness config: run on a virtual 8-device CPU mesh.

Multi-chip sharding tests need multiple devices; real TPU hardware in CI has
one chip, so tests force the CPU backend with 8 virtual devices.  Note the
environment's axon sitecustomize overrides JAX_PLATFORMS at interpreter
start, so we must re-override via jax.config *after* importing jax (but
before any backend is initialised).  Set DFGNN_TEST_TPU=1 to run the suite
on real hardware instead.
"""

import os

_ON_TPU = bool(os.environ.get("DFGNN_TEST_TPU"))

if not _ON_TPU:
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
