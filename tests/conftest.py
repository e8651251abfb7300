"""Test config: force an 8-device virtual CPU mesh before JAX initialises.

Multi-chip sharding paths are exercised on virtual CPU devices
(`--xla_force_host_platform_device_count=8`); the driver separately
dry-runs them via `__graft_entry__.dryrun_multichip`.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The axon TPU-tunnel site hook overrides JAX_PLATFORMS; the config knob
# is honoured, so force CPU through it.
jax.config.update("jax_platforms", "cpu")

from mlsp_tpu.utils.cache import enable as _enable_cache

_enable_cache(os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu"))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
