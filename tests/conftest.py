"""Test configuration: force JAX onto a virtual 8-device CPU platform.

The sandbox's sitecustomize registers a TPU backend at interpreter start and
forces platform selection via env; ``jax.config.update`` after import still
wins because backends initialize lazily (SURVEY.md §4: the fake-8-device
trick so DP/FSDP/TP sharding paths are testable without TPU hardware).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if ("xla_backend_optimization_level" not in flags
        and not os.environ.get("BIOM3_FULL_XLA_OPT")):
    # the suite is compile-bound on the 1-core CI boxes; opt level 0 cuts
    # cold wall-clock ~30% and is semantics-preserving (parity suites stay
    # green — HIGHEST matmul precision is a lowering choice, not an
    # optimization pass).  BIOM3_FULL_XLA_OPT=1 restores production
    # compilation for perf-sensitive investigations.
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags

import jax

jax.config.update("jax_platforms", "cpu")
# parity tests compare f32 numerics against torch; make matmuls exact f32
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: the suite is dominated by CPU XLA compiles of
# the same graphs every run (~400 s of the ~530 s wall).  Keyed by HLO
# hash, so edits to a model invalidate exactly its own entries.  The dir is
# additionally keyed by a host-CPU fingerprint: sandbox machines change
# between rounds, and XLA:CPU AOT artifacts built for another machine's
# feature set load with SIGILL-risk warnings instead of recompiling.


def _machine_tag() -> str:
    import hashlib
    import platform

    try:
        with open("/proc/cpuinfo") as fh:
            flags = next(ln for ln in fh if ln.startswith("flags"))
        h = hashlib.sha1(flags.encode()).hexdigest()[:8]
    except (OSError, StopIteration):
        h = "na"
    return f"{platform.machine()}-{h}"


_CACHE_DIR = os.path.join(
    os.path.dirname(__file__), "..", ".jax_cache", _machine_tag()
)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
# subprocess-launching tests reuse the same machine-keyed dir
os.environ["JAX_COMPILATION_CACHE_DIR"] = _CACHE_DIR
os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.1"

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy compile-bound test; default-skipped, run with RUN_SLOW=1 "
        "(each has a cheaper sibling or a driver artifact covering the path)",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow tier: set RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
