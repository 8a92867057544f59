"""Test configuration: run everything on a virtual 8-device CPU mesh with
float64 enabled (op tests use f64 like the reference's gradchecks,
testing/test_*.py; TPU benchmarking uses f32 separately).

NOTE: the environment's sitecustomize force-registers a remote TPU platform
and overrides JAX_PLATFORMS via jax.config, so we must override the config
*after* importing jax, before any backend is initialized.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1)
