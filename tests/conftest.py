"""Test configuration.

Forces JAX onto a virtual 8-device CPU backend so every test — including the
multi-device sharding tests — runs without TPU hardware, per the standard
JAX fake-backend recipe.
"""

import os

# Must be set before jax initializes a backend. The sandbox pins
# JAX_PLATFORMS=axon (a remote TPU tunnel) in the environment, so override
# both the env var and the config flag. REFTR_TEST_TPU=1 opts out, keeping
# the real backend so the TPU-gated tests (kernel dropout oracle) run.
if os.environ.get("REFTR_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if os.environ.get("REFTR_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
