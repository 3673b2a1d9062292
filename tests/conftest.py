"""Test configuration: deterministic CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual CPU mesh (the standard JAX
pattern for testing pjit/shard_map layouts without hardware); the real-TPU
path is exercised by bench.py and the driver's compile checks instead.

The container pre-imports jax via sitecustomize with JAX_PLATFORMS=axon (a
network tunnel to one shared TPU chip, which can stall arbitrarily long when
the chip is busy), so plain env vars are too late — the platform must be
overridden through jax.config before any backend initializes. Set
JPEG_TPU_TEST_PLATFORM=axon to deliberately run the suite on hardware.
"""

import os

_platform = os.environ.get("JPEG_TPU_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)
# Persistent compile cache: the suite compiles ~25 pipeline variants; cold
# runs pay once, subsequent runs are seconds.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(0x5EED)
