"""Test harness config.

Mirrors Ginkgo's testing discipline (SURVEY.md §4): the jnp reference tier is
the oracle, tests run on CPU with 8 virtual devices so the distributed tier
(mesh + shard_map) is exercised without real multi-chip hardware, and x64 is
enabled so the fp64 reference configs match Ginkgo's tolerances.
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
