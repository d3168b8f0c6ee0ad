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

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

YOLO_DIR = "/root/reference/examples/YOLOv8n_wasm/yolov8n_fp32/"


def has_yolo() -> bool:
    return os.path.exists(YOLO_DIR + "model.txt")
