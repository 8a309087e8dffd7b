"""Test harness config.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths
(``jax.sharding.Mesh`` + ``shard_map``) are exercised without TPU hardware.
Platform must be forced before jax initializes a backend; the axon TPU
plugin (when present) sets ``jax_platforms`` via jax.config at interpreter
boot, so env vars alone are not enough — override through jax.config too.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
