"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (the standard TPU-less stand-in for
pod-slice tests): multi-chip sharding paths compile and execute against 8
XLA CPU devices. Note the environment's axon sitecustomize force-registers
the TPU backend at interpreter start, so `jax.config.update` (not just env
vars) is required to pin the CPU platform.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

import henbun_tpu as hb


@pytest.fixture(autouse=True)
def _seed():
    """Deterministic host-side init RNG per test, the analog of the
    reference's tf.set_random_seed(0) + np.random.RandomState(0) pattern."""
    hb.set_seed(0)
    yield


@pytest.fixture(autouse=True, scope="module")
def _bounded_compile_cache():
    """Clear jax's in-process executable caches between test MODULES.

    The full suite runs ~540 tests (hundreds of distinct compiles) in one
    process; by the ~530th test XLA's CPU compiler segfaulted inside
    `backend_compile_and_load` on a program that compiles fine standalone
    (reproduced twice at the same spot, round 5). Per-module clearing
    bounds the accumulated compiler/executable state; tests share compiled
    programs WITHIN a module, so the re-compile cost across 39 modules is
    small next to the suite's runtime."""
    yield
    jax.clear_caches()
