"""Test configuration: run JAX on 8 virtual CPU devices so sharding
tests exercise real multi-device code paths without TPU hardware."""

import os

# Force CPU: the environment presets JAX_PLATFORMS=axon (a one-chip TPU
# tunnel) and its sitecustomize imports jax at interpreter startup, so the
# env var alone is captured too early — update the jax config directly.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest

from vcf_tpu.io.images import test_image


@pytest.fixture(scope="session")
def img512():
    return test_image(512, 512)


@pytest.fixture(scope="session")
def img_small():
    return test_image(64, 48, seed=3)


@pytest.fixture(scope="session")
def img_odd():
    """Non-multiple-of-block-size dimensions to exercise padding."""
    return test_image(61, 45, seed=11)
