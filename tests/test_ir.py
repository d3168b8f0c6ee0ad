"""IR parser/serializer tests, incl. the real YOLOv8n model.txt as a golden."""

import numpy as np
import pytest

from onnxstream_tpu.dtypes import DType, mangle_name, demangle_name
from onnxstream_tpu.ir import parse_model_txt, parse_op_line, parse_tensor_string

from conftest import YOLO_DIR, has_yolo


def test_parse_tensor_plain():
    t = parse_tensor_string("x(1,3,640,640)")
    assert t.name == "x" and t.shape == (1, 3, 640, 640) and t.dtype == DType.none
    assert not t.is_weight


def test_parse_tensor_weight():
    t = parse_tensor_string("w.bin(float32:16,3,3,3)")
    assert t.is_weight and t.dtype == DType.float32 and t.shape == (16, 3, 3, 3)
    assert t.nbytes == 16 * 3 * 3 * 3 * 4


def test_parse_tensor_quant():
    t = parse_tensor_string("w.bin(uint8[0.0123,17]:64,64)")
    assert t.dtype == DType.uint8
    assert t.scale == pytest.approx(0.0123)
    assert t.zero_point == 17


def test_parse_tensor_dynamic_requires_flag():
    with pytest.raises(ValueError):
        parse_tensor_string("x(1,0,4)")
    t = parse_tensor_string("x(1,0,4)", allow_dynamic=True)
    assert t.has_dynamic_dims


def test_parse_op_line_roundtrip():
    line = (
        "/m/Conv:Conv*input:x(1,3,8,8);w.bin(float32:4,3,3,3);b.bin(float32:4)"
        "*output:y(1,4,8,8)*dilations:1,1;group:1;kernel_shape:3,3;pads:1,1,1,1;strides:1,1"
    )
    op = parse_op_line(line)
    assert op.op_type == "Conv" and op.name == "/m/Conv"
    assert op.attr_ints("pads") == (1, 1, 1, 1)
    assert op.attr_int("group") == 1
    assert op.to_line() == line


def test_empty_optional_input():
    op = parse_op_line("r:Resize*input:x(1,3,4,4);;s.bin(float32:4)*output:y(1,3,8,8)*mode:nearest")
    assert op.inputs[1].name == ""


def test_mangle_roundtrip():
    for s in ["/model.0/conv.weight", "onnx::Split_137", "plain", "a b:c"]:
        assert demangle_name(mangle_name(s)) == s


@pytest.mark.skipif(not has_yolo(), reason="reference YOLO model not present")
def test_parse_yolo_model():
    with open(YOLO_DIR + "model.txt") as f:
        g = parse_model_txt(f.read())
    assert len(g.ops) == 233
    assert "images" in g.inputs
    assert g.inputs["images"].shape == (1, 3, 640, 640)
    # all weight files exist on disk with the right byte counts
    import os

    for t in list(g.weights.values())[:50]:
        p = YOLO_DIR + t.name
        assert os.path.exists(p), t.name
        assert os.path.getsize(p) == t.nelem * t.dtype.itemsize
    # serialization round-trips through the parser
    g2 = parse_model_txt(g.to_text())
    assert len(g2.ops) == len(g.ops)
    assert g2.ops[0].to_line() == g.ops[0].to_line()
    # op histogram matches the reference model (README-documented op set)
    from collections import Counter

    hist = Counter(op.op_type for op in g.ops)
    assert hist["Conv"] == 64 and hist["Split"] == 9 and hist["Softmax"] == 1
