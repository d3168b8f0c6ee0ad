import os

# Tests run on the CPU backend with a virtual 8-device mesh so multi-chip
# sharding is exercised without TPU hardware. Must be set before jax imports
# (and must override the environment's default TPU platform).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

YOLO_DIR = "/root/reference/examples/YOLOv8n_wasm/yolov8n_fp32/"


def has_yolo() -> bool:
    return os.path.exists(YOLO_DIR + "model.txt")
