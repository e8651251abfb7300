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


def pytest_collection_modifyitems(config, items):
    """Tiering: anything not marked slow/e2e is the `unit` fast tier.

    `pytest -m unit` = fast per-change iteration (minutes);
    `-m "not e2e"` adds the slow differentials; bare `pytest tests/`
    runs everything (~full-suite budget, see CLAUDE.md).
    """
    for item in items:
        if not any(m.name in ("slow", "e2e") for m in item.iter_markers()):
            item.add_marker(pytest.mark.unit)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
