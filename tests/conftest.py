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
# persistent compile cache: the deep model inits/train steps dominate test
# time on this 1-core host; cached executables cut reruns drastically
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
