"""Test harness configuration.

Forces JAX onto the CPU backend with 8 virtual devices so multi-chip sharding
paths (Mesh/pjit/shard_map) compile and execute without TPU hardware — the
TPU-world analogue of a fake distributed backend (SURVEY.md §4).

Must run before anything imports jax, hence the env mutation at module scope.
"""

import os
import sys
from pathlib import Path

# The session environment pins JAX_PLATFORMS=axon (TPU) through a site hook
# that overrides the env var, so set the platform through jax.config (which
# wins) — tests always run on the virtual-device CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(2025)
