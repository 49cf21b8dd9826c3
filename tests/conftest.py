"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run without TPU hardware (the JAX-idiomatic fake
backend, see SURVEY.md section 4).

Note: this environment pre-imports jax at interpreter startup (an axon
sitecustomize that calls ``jax.config.update("jax_platforms", "axon,cpu")``),
so plain JAX_PLATFORMS env vars are overridden; we must update the config
after import, before any backend is initialised.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"

# Persistent compile cache: the suite re-jits the same graphs every run;
# cache entries are keyed by backend+HLO so CPU/TPU artifacts coexist, and
# the CPU cache dir is machine-fingerprint-scoped (compile_cache.py).  The
# XLA:CPU AOT loader logs a false-positive feature-mismatch ERROR per
# cached entry (pseudo-features like +prefer-no-scatter never appear in
# raw CPUID flags); silence C++ logs -- Python exceptions still surface.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
from temporal_latticenet_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
