"""Produce golden YOLOv8n outputs for the in-tab interpreter parity check.

Runs the Python/TPU runtime (YoloPipeline, same injected pre/post text ops)
on a deterministic synthetic frame and writes raw float32 .bin files that
examples/yolo_browser/offline.html's window.runParity() fetches and compares
against the in-browser JavaScript interpreter — the reference's cross-machine
golden-output discipline (reference sd.cpp:860-876 print_max_dist) applied
across runtimes.

Usage: python tools/make_yolo_golden.py [outdir] [--image]
  --image   render the same synthetic test pattern offline.html draws
            (gray field + red square + blue disc) instead of uniform noise
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synthetic_pattern() -> np.ndarray:
    """The offline.html no-camera fallback frame, rasterized without a canvas."""
    img = np.zeros((640, 640, 4), np.float32)
    img[:, :, :3] = 127.0
    img[160:480, 160:480, 0] = 0xB0
    img[160:480, 160:480, 1] = 0x30
    img[160:480, 160:480, 2] = 0x30
    yy, xx = np.mgrid[0:640, 0:640]
    disc = (yy - 320) ** 2 + (xx - 320) ** 2 <= 100 ** 2
    img[disc, 0] = 0x30
    img[disc, 1] = 0x60
    img[disc, 2] = 0xB0
    img[:, :, 3] = 255.0
    return img


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") \
        else "/tmp/yolo_golden"
    os.makedirs(outdir, exist_ok=True)

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from conftest import YOLO_DIR  # the in-repo real fp32 model

    from onnxstream_tpu.models.yolo import YoloPipeline

    if "--image" in sys.argv:
        img = synthetic_pattern()
    else:
        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (640, 640, 4)).astype(np.float32)

    pipe = YoloPipeline.from_model_txt(YOLO_DIR + "model.txt")
    s = pipe.session
    s.clear_tensors()
    s.add_tensor("images_raw", img[None])
    s.add_tensor("slice_start", np.array([0], np.int64))
    s.add_tensor("slice_end", np.array([3], np.int64))
    s.add_tensor("slice_axis", np.array([3], np.int64))
    s.add_tensor("div_value", np.array([255.0], np.float32))
    s.add_tensor("split_arg", np.array([4, 80], np.int64))
    out = s.run()
    boxes = np.asarray(out["output0_0"], np.float32)   # (1, 8400, 4)
    scores = np.asarray(out["output0_1"], np.float32)  # (1, 8400, 80)

    img[None].astype(np.float32).tofile(os.path.join(outdir, "input.bin"))
    boxes.tofile(os.path.join(outdir, "output0_0.bin"))
    scores.tofile(os.path.join(outdir, "output0_1.bin"))
    print(f"golden written to {outdir}: boxes {boxes.shape} scores {scores.shape}")
    print(f"boxes range [{boxes.min():.3f}, {boxes.max():.3f}]  "
          f"scores range [{scores.min():.6f}, {scores.max():.6f}]")


if __name__ == "__main__":
    main()
