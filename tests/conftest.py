"""Test configuration: force CPU with 8 virtual devices.

The image's sitecustomize registers the axon TPU backend at interpreter
startup (jax is already imported before conftest runs), so env vars alone
are not enough — we must also flip ``jax.config`` before any computation.
Multi-chip sharding is validated on a virtual 8-device CPU mesh; the real
TPU is exercised only by bench.py / the driver.
"""

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: repeated suite runs skip recompiles
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_applecider_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
