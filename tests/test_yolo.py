"""YOLOv8n detection pipeline: NMS parity, text-op injection, real model E2E."""

import numpy as np
import pytest

from onnxstream_tpu.models.yolo import YoloPipeline, non_max_suppression

from conftest import YOLO_DIR, has_yolo


# ------------------------------------------------------------------- NMS unit
def test_nms_basic_suppression():
    boxes = np.array([
        [0, 0, 10, 10],
        [1, 1, 11, 11],   # heavy overlap with 0
        [50, 50, 60, 60],
    ], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    sel = non_max_suppression(boxes, scores, iou_threshold=0.45, score_threshold=0.25)
    assert sel == [0, 2]


def test_nms_score_threshold():
    boxes = np.array([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32)
    scores = np.array([0.9, 0.1], np.float32)
    assert non_max_suppression(boxes, scores, score_threshold=0.25) == [0]


def test_nms_descending_order_and_cap():
    boxes = np.array([[i * 100, 0, i * 100 + 10, 10] for i in range(5)], np.float32)
    scores = np.array([0.3, 0.9, 0.5, 0.8, 0.7], np.float32)
    sel = non_max_suppression(boxes, scores, max_output_size=3)
    assert sel == [1, 3, 4]  # by descending score, capped


def test_nms_iou_exact_threshold_suppresses():
    # IoU >= threshold suppresses (TF.js uses >=, NonMaxSuppression.js:163)
    boxes = np.array([[0, 0, 10, 10], [0, 5, 10, 15]], np.float32)  # IoU = 1/3
    scores = np.array([0.9, 0.8], np.float32)
    assert non_max_suppression(boxes, scores, iou_threshold=1 / 3) == [0]
    assert non_max_suppression(boxes, scores, iou_threshold=0.34) == [0, 1]


# --------------------------------------------------------------- real model
@pytest.mark.skipif(not has_yolo(), reason="reference yolov8n model not present")
def test_yolo_e2e_injected_ops():
    pipe = YoloPipeline.from_model_txt(YOLO_DIR + "model.txt")
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (640, 640, 4)).astype(np.float32)
    dets = pipe.detect(img, score_threshold=-1e9, max_output_size=5)
    assert dets.boxes.shape == (8400, 4)
    assert dets.scores.shape == (8400,)
    assert dets.classes.shape == (8400,)
    assert len(dets.indices) == 5
    # boxes roughly in input pixel space
    assert np.isfinite(dets.boxes).all()
    # rgb input grows an alpha channel automatically
    dets_rgb = pipe.detect(img[:, :, :3], score_threshold=-1e9, max_output_size=5)
    np.testing.assert_allclose(dets_rgb.boxes, dets.boxes, rtol=1e-4, atol=1e-3)


@pytest.mark.skipif(not has_yolo(), reason="reference yolov8n model not present")
def test_yolo_cli(tmp_path, capsys):
    from PIL import Image

    from onnxstream_tpu.cli.yolo_main import main

    img = tmp_path / "in.png"
    Image.fromarray(np.random.RandomState(1).randint(0, 255, (320, 320, 3), np.uint8)).save(str(img))
    out = tmp_path / "out.png"
    rc = main(["--model", YOLO_DIR + "model.txt", "--image", str(img),
               "--output", str(out), "--score-threshold", "0.0"])
    assert rc == 0
    assert out.exists()
