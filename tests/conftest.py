"""Test configuration: force an 8-virtual-device CPU platform.

This is the JAX-native substitute for "multi-node without a cluster"
(SURVEY.md §4): sharding/pjit paths are exercised on 8 fake CPU devices.
Must run before jax is imported anywhere.
"""

import os

# Force CPU: the environment pre-sets JAX_PLATFORMS=axon (the real chip),
# but unit tests must run on the virtual 8-device CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: XLA:CPU compiles some ops (scale_and_translate,
# the detector graph) in tens of seconds on this 1-core box; cache across runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1337)
