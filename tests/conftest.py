"""Test configuration: force CPU with a virtual 8-device mesh so sharding
tests run without TPU hardware.

Note: this environment registers a remote 'axon' TPU plugin via
sitecustomize that wins over the JAX_PLATFORMS env var, so the platform
must be forced through jax.config AFTER import (XLA_FLAGS still must be
set before backend init for the host device count)."""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")
# Bit-exact f32 matmuls in tests (TPU default would be bf16 passes).
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
