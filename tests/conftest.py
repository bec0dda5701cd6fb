"""Test configuration.

Forces JAX onto a virtual 8-device CPU backend so every test — including the
multi-device sharding tests — runs without TPU hardware, per the standard
JAX fake-backend recipe.
"""

import os

# Must be set before jax initializes a backend. The sandbox pins
# JAX_PLATFORMS=axon (a remote TPU tunnel) in the environment, so override
# both the env var and the config flag.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
