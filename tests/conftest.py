"""Test harness: run everything on CPU with 8 virtual devices.

This is the TPU-native substitute for multi-node testing without a cluster
(SURVEY §4): sharding/pjit code paths are exercised on a virtual 8-device mesh.
Must run before jax is imported anywhere.
"""
import os

# The axon sitecustomize registers the TPU backend at interpreter startup and
# pins JAX_PLATFORMS=axon, so the env var alone is not enough — use the config
# API (it wins over the env) plus XLA_FLAGS before first backend use.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
