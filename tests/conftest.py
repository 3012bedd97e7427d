"""Test configuration: run everything on a virtual 8-device CPU mesh.

The host environment preselects the TPU platform at interpreter startup
(sitecustomize registers an 'axon' backend and calls
jax.config.update("jax_platforms", "axon,cpu"), overriding env vars), so a
config update — not JAX_PLATFORMS — is the reliable way to force CPU. The
XLA host-device-count flag must land before the CPU client initializes.
"""
import os

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
    return np.random.default_rng(1234)
