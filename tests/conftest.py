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
