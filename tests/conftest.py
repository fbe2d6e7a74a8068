"""Test harness: run everything on a virtual 8-device CPU mesh.

The standard JAX fake-backend trick (SURVEY.md §4): pjit/collective tests
use XLA's host platform with 8 virtual devices instead of a real pod.

NOTE: this environment pre-imports jax before pytest starts, so plain
JAX_PLATFORMS env vars are too late — but the backend itself initializes
lazily, so switching via jax.config before the first device use still
works (verified: jax.devices() -> 8 CpuDevice).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
