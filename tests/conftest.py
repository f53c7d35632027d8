"""Test configuration: force JAX onto a virtual 8-device CPU platform.

This must run before jax initializes its backends, hence the env mutation at
import time (SURVEY.md §4: the standard fake-8-device trick so DP/FSDP/TP
sharding paths are testable without TPU hardware).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import numpy as np
import pytest

# parity tests compare f32 numerics against torch; make matmuls exact f32
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
