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

# Tests that drive the CLI enable the persistent XLA compilation cache
# (cli.main → enable_compilation_cache), which then also catches every later
# in-process compile.  Disable it outright under pytest: CPU compiles don't
# need cross-run caching, and jax's executable serializer has segfaulted
# writing entries — first racing a TPU probe on the shared
# ~/.cache/jax_compilation, then SOLO on a private tmp dir (a pjit train-step
# executable, put_executable_and_time, 2026-08-18 — NOTES.md round 3).
# JAX_CACHE_DIR stays pointed at a private dir as defense in depth for any
# path that ignores the kill switch.
import tempfile  # noqa: E402

os.environ["ATT_ASPP_DISABLE_COMPILE_CACHE"] = "1"
os.environ["JAX_CACHE_DIR"] = tempfile.mkdtemp(prefix="jax_cache_pytest_")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_compilation_cache", False)

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled-executable caches at module boundaries.

    A full single-process suite run accumulates every module's compiled
    programs; past ~2/3 of the suite the NEXT large pjit compile
    segfaults inside XLA (``backend_compile_and_load`` — reproduced
    three times at the train-step compiles, 2026-08-18).  Either half of
    the suite passes alone, so the trigger is the cumulative executable
    count, not any one test.  Releasing the caches between modules keeps
    the live-program population bounded; modules recompile what they
    share (CPU compiles are cheap).
    """
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(2025)
