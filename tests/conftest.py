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


# ---------------------------------------------------------------------------
# Smoke tier (`pytest -m smoke`, VERDICT r4 #5): one representative test per
# component family plus every deployment-contract test — measured 37 tests in
# ~20 min on the 1-core host (compiles dominate) vs ~50 min for the full
# suite, so mid-round "did I break anything" checks are cheap enough to
# actually run (round 3 shipped a red test precisely because the only tier
# was the full suite).  The full suite stays MANDATORY at the end-of-round
# HEAD (CLAUDE.md).  Patterns match the start of "file.py::test_name", so
# one entry covers every parametrization.
SMOKE_TESTS = (
    "test_aot_serving.py::test_aot_miss_falls_back_to_jit",
    "test_augment_geometry.py::test_warp_pair_batch_matches_map_coordinates",
    "test_cli_weights.py::test_load_variables_orbax_roundtrip",
    "test_compat.py::test_att_aspp_facade",
    "test_config.py::test_config_roundtrip",
    "test_cv2_parity.py::test_measure_ac_matches_cv2_fitellipse",
    "test_e2e_reference_parity.py::test_predict_case_matches_reference",
    "test_evals_tools.py::test_evaluate_directories",
    "test_fast_forward.py::test_engine_fast_path_matches_flax_path",
    "test_infer.py::test_container_run_contract",
    "test_infer.py::test_predict_directory_bulk_matches_per_case",
    "test_io_mha.py::test_roundtrip_through_itk_field_order",
    "test_losses.py::test_criterion_main_stage",
    "test_measure.py::test_measure_ac_ellipse",
    "test_model_parity.py::test_v1_full_model_parity",
    "test_native.py::test_mha_native_roundtrip",
    "test_nnunet_import.py::test_nnunet_import_parity",
    "test_ops_image.py::test_clahe_with_padding",
    "test_packed_stage.py::test_engine_w2d_stage_matches_direct",
    "test_pallas_kernels.py::test_clahe_pallas_path_equals_xla_path",
    "test_panels_and_contract.py::test_run_from_env_honours_env",
    "test_panels_and_contract.py::test_dockerfile_copy_sources_exist",
    "test_postprocess.py::test_refine_mask_scenario",
    "test_predict_extras.py::test_predict_with_extras",
    "test_quant_int8.py::test_engine_int8_auto_calibrates_and_matches",
    "test_resume_remat.py::test_fit_resumes_from_last",
    "test_sharded_inference.py::test_sharded_predict_case_matches_unsharded",
    "test_sliding_window.py::test_sliding_window_matches_oracle",
    "test_synthetic.py::test_make_sweep_quality_ramp",
    "test_train.py::test_train_step_improves_loss",
    "test_train.py::test_fit_smoke",
    "test_volume_and_edges.py::test_container_with_tiff_and_black_sweep",
    "test_w2d.py::test_flagship_model_lowering_parity",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        nodeid = item.nodeid.split("tests/")[-1]
        if any(nodeid.startswith(pat) for pat in SMOKE_TESTS):
            item.add_marker(pytest.mark.smoke)
