"""Test configuration: run everything on CPU with 8 virtual devices.

Tests must be deterministic and runnable without TPU hardware; the
multi-chip sharding tests use the virtual CPU mesh. These env vars must
be set before jax initializes its backends, hence module scope here.
"""

import os
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()
# float32 matmuls on CPU for parity tests
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")
# Persistent compilation cache: the suite is XLA-compile dominated on
# this shared CPU (a tiny-model grad step costs >60 s to compile, <1 s
# to run), and the graphs are identical run to run.  Warm runs cut the
# heavy tests 3-4x.  The AOT loader logs a scary per-entry E-level
# "machine features mismatch" about prefer-no-scatter/gather pseudo-
# features; compile and execution host are the same machine here, so
# silence the spam.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(Path(__file__).resolve().parent.parent / ".cache" / "jax"))
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402
import pytest  # noqa: E402

# The axon site hook re-exports JAX_PLATFORMS=axon; the config update wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# The JAX_COMPILATION_CACHE_DIR env var is NOT bound to the config on
# this jax version — without the explicit update the cache silently
# never engages (measured: zero cache writes over a full suite run) and
# every run pays full cold-compile cost.
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

# --------------------------------------------------------------- smoke --
# The `-m smoke` tier: ONE representative test per subsystem, chosen for
# breadth-per-second (driver/CI gate; ~2-3 min warm on the builder box
# vs ~15 min for the full `-m "not slow"` suite).  Kept as a central
# list so the tier stays deliberate — add a line when a new subsystem
# lands, don't scatter markers.
SMOKE_NODEIDS = {
    # compute path: frontend -> masking -> layers -> captioner -> decode
    "test_frontend.py::test_logmel_shapes_and_feat_len",
    "test_masking.py::test_mean_with_lens_matches_manual",
    "test_layers.py::test_decoder_layer_step_matches_full_forward",
    "test_captioner.py::test_greedy_decode_consistent_with_full_forward",
    "test_decoding.py::test_beam_search_matches_reference_loop[3]",
    # fused whole-loop Pallas decode kernels + pallas ops
    "test_fused_greedy.py::test_bake_params_modes_token_identical",
    "test_fused_beam.py::test_fused_beam_interpret_token_parity",
    "test_pallas_mbconv.py::test_xla_fallback_stride2",
    "test_pallas_logmel.py::test_pallas_logmel_matches_frontend"
    "[EFFB2_MEL_16K]",
    # model zoo breadth: PANNs-small, M2 family, registry build
    "test_encoders_extra.py::test_panns_small_encoders"
    "[Cnn6Encoder-512-16]",
    "test_m2.py::test_m2_encoder_shapes_and_levels",
    "test_registry.py::test_event_transformer_decoder_from_config",
    # data pipeline
    "test_data.py::test_text_collate_sorts_and_tokenizes",
    "test_data.py::test_caption_dataset",
    "test_prefetch.py::test_train_step_expands_f16_wire",
    # metrics (python + native C++ CIDEr + java-branch contract)
    "test_metrics.py::test_evaluate_captions_end_to_end",
    "test_native.py::test_fast_cider_matches_python",
    "test_eval_java_branch.py::test_java_branch_tokenizer_preference"
    "_and_spider",
    # training: XE step, GSPMD mesh, KD, SCST, temporal conditioning
    "test_training.py::test_train_step_reduces_loss",
    "test_training.py::test_train_step_data_parallel_mesh",
    "test_distill.py::test_token_kd_step",
    "test_extended.py::test_scst_step_end_to_end",
    "test_temporal.py::test_temporal_decoder_conditioning_changes_logits",
    # serving + CLI entry points
    "test_serving.py::test_results_match_direct_decode",
    "test_cli.py::test_debug_step",
    # round-5 subsystems: offline scorer approximations, HF-zoo
    # checkpoint interop, production wiring + orphan guard, the
    # vs_baseline artifact, corpus v2
    "test_spice_py.py::test_all_four_phrasings_agree",
    "test_extra_metrics.py::test_eval_tools_specificity_cli",
    "test_wiring.py::test_build_loss_multiple_loss_sum",
    "test_no_orphan_modules.py::test_no_orphan_package_modules",
    "test_reference_floor.py::test_reference_floor_artifact_contract",
    "test_corpus_v2.py::test_references_split_synonyms",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        nodeid = item.nodeid
        if nodeid.startswith("tests/"):
            nodeid = nodeid[len("tests/"):]
        if nodeid in SMOKE_NODEIDS:
            item.add_marker(pytest.mark.smoke)
