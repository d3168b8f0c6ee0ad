import os

# Tests run on the CPU backend with a virtual 8-device mesh so multi-chip
# sharding is exercised without TPU hardware. The environment's sitecustomize
# imports jax and registers the axon TPU plugin before conftest runs, so the
# env var alone is too late — force the platform through jax.config (backends
# are not initialized yet at this point).
#
# OSTPU_TPU_TESTS=1 opts out: the suite runs on the real chip so the
# TPU-gated tests (Pallas kernels vs oracle) actually execute.
if os.environ.get("OSTPU_TPU_TESTS", "") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", "tests must run on the CPU backend"

# The suite is compile-dominated on this 1-core host (the same graphs are
# re-jitted every run). JAX's persistent compilation cache works on the CPU
# PJRT backend too: first run populates ~./.cache/jax_tests, repeat runs cut
# wall time roughly in half. Thresholds at 0/-1 so even small executables
# (the tail of 300+ tiny tests) are cached.
import jax as _jax

_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                          ".cache", "jax_tests")
_jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
_jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

YOLO_DIR = "/root/reference/examples/YOLOv8n_wasm/yolov8n_fp32/"


def has_yolo() -> bool:
    return os.path.exists(YOLO_DIR + "model.txt")


# ---------------------------------------------------------------- test tiers
# Duration-based tiering (VERDICT r2 #7): the default tier must stay under
# ~3 min cold on this 1-core host so rounds never time out on their own
# safety net; `pytest -m slow` runs the heavy E2E tier (see pyproject.toml).
# Central list rather than per-file decorators so the policy is auditable in
# one place; durations measured 2026-08-19 with a cold compile cache.
_SLOW_BY_NAME = {
    "test_w8a8_unet_output_parity",                     # 188 s
    "test_generate_on_device_multichunk_matches_host",  # 124 s
    "test_sd15_graph_shape",                            # 45 s
    "test_qu8_vae_decode_image_parity",                 # 39 s
    "test_auto_layout_parity",                          # 39 s
    "test_cfg2_latents_match_sequential",               # 31 s
    "test_clip_text_encoder_matches_hf",                # 28 s
    "test_pipeline_parallel_segments_match_single_device",  # 26 s
    "test_auto_layout_disabled_paths",                  # 26 s
    "test_shared_cache_keys_include_layout",            # 24 s
    "test_yolo_e2e",                                    # 18 s
    "test_tiny_unet_fused_matches_unfused",             # 18 s
    "test_session_mesh_sharded_inference_matches_single",  # 17 s
    "test_sdxl_cli",                                    # 17 s
    "test_generate_batch_xl",                           # 16 s
    "test_session_parity_fused_vs_decomposed",          # 15 s
    "test_generate_on_device_xl_turbo",                 # 15 s
    "test_sharded_forward_matches_single_device",       # 14 s
    "test_sdxl_turbo_skips_uncond",                     # 13 s
    "test_extra_output_inside_conv_land",               # 13 s
    "test_unet_parity_and_patterns",                    # 13 s
    "test_sd_cli_synthetic",                            # 12 s
    "test_generate_batch_matches_sequential",           # 12 s
    "test_packed_heads_fusion_matches_unpacked",        # 12 s
    "test_tiny_unet_runs_and_fuses",                    # 12 s
    "test_generate_on_device_stop_truncation_consistent",  # 12 s
    "test_sd_cli_latents_roundtrip",                    # 11 s
    "test_whisper_http_example",                        # 11 s
    # kept in the default tier on purpose: test_generate_on_device_matches_
    # host (~15 s) is the flagship SD E2E guard.
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        base = item.name.split("[", 1)[0]
        if base in _SLOW_BY_NAME:
            item.add_marker(_pytest.mark.slow)
