"""onnx2txt converter: protobuf codec roundtrip, conversion rules, E2E run."""

import numpy as np
import pytest

from onnxstream_tpu.convert.onnx2txt import convert, mangle_name, quantize_uint8
from onnxstream_tpu.convert.onnxproto import (
    TP_INT64,
    encode_model,
    encode_node,
    encode_tensor,
    load_onnx,
)


def _simple_model():
    """x (1,2,3) -> Mul w -> Add b -> y ; weights as initializers."""
    w = np.arange(6, dtype=np.float32).reshape(2, 3) + 1
    b = np.array([0.5, 1.5, 2.5], np.float32)
    nodes = [
        encode_node("Mul", ["x", "w"], ["t0"], name="mul_0"),
        encode_node("Add", ["t0", "b"], ["y"], name="add_0"),
    ]
    data = encode_model(nodes, inputs=[("x", (1, 2, 3))], outputs=[("y", (1, 2, 3))],
                        initializers={"w": w, "b": b})
    return data, w, b


def test_proto_roundtrip():
    data, w, b = _simple_model()
    g = load_onnx(data)
    assert [n.op_type for n in g.nodes] == ["Mul", "Add"]
    assert g.nodes[0].inputs == ["x", "w"]
    np.testing.assert_array_equal(g.initializers["w"].data, w)
    np.testing.assert_array_equal(g.initializers["b"].data, b)
    assert g.inputs[0].name == "x" and g.inputs[0].dims == (1, 2, 3)


def test_mangle_name_matches_reference():
    # reference src/bindings.py:310-317 / notebook get_final_name
    assert mangle_name("a.b/c") == "a_2E_b_2F_c"
    assert mangle_name("input_ids") == "input_5F_ids"
    assert mangle_name("plain123") == "plain123"


def test_convert_and_run(tmp_path):
    data, w, b = _simple_model()
    out = str(tmp_path / "m")
    text = convert(data, out)
    assert "mul_5F_0:Mul" in text
    assert "w.bin(float32:2,3)" in text

    from onnxstream_tpu.runtime.session import Session

    s = Session(weights_provider_name="nocache")
    s.read_file(out + "/model.txt")
    x = np.random.RandomState(0).rand(1, 2, 3).astype(np.float32)
    s.add_tensor("x", x)
    res = s.run()
    np.testing.assert_allclose(np.asarray(res["y"]), x * w + b, rtol=1e-5)


def test_convert_constant_inlining(tmp_path):
    c = np.array([2.0], np.float32)
    nodes = [
        encode_node("Constant", [], ["cst"], name="const_0", value=c),
        encode_node("Mul", ["x", "cst"], ["y"], name="mul_0"),
    ]
    data = encode_model(nodes, inputs=[("x", (2, 2))], outputs=[("y", (2, 2))], initializers={})
    out = str(tmp_path / "m")
    text = convert(data, out)
    assert "Constant" not in text
    assert "cst.bin(float32:1)" in text


def test_convert_gemm_transpose_fold(tmp_path):
    w = np.arange(12, dtype=np.float32).reshape(4, 3)
    nodes = [encode_node("Gemm", ["x", "w"], ["y"], name="gemm_0", transB=1, alpha=1.0, beta=1.0)]
    data = encode_model(nodes, inputs=[("x", (2, 3))], outputs=[("y", (2, 4))], initializers={"w": w})
    out = str(tmp_path / "m")
    text = convert(data, out)
    assert "w_transposed.bin(float32:3,4)" in text
    assert "transB" not in text
    saved = np.fromfile(out + "/w_transposed.bin", np.float32).reshape(3, 4)
    np.testing.assert_array_equal(saved, w.T)


def test_convert_conv_dual_layout(tmp_path):
    w = np.random.RandomState(0).rand(4, 3, 3, 3).astype(np.float32)
    bias = np.zeros(4, np.float32)
    nodes = [encode_node("Conv", ["x", "w", "bias"], ["y"], name="conv_0",
                         kernel_shape=[3, 3], pads=[1, 1, 1, 1], strides=[1, 1],
                         dilations=[1, 1], group=1)]
    data = encode_model(nodes, inputs=[("x", (1, 3, 8, 8))], outputs=[("y", (1, 4, 8, 8))],
                        initializers={"w": w, "bias": bias})
    out = str(tmp_path / "m")
    text = convert(data, out)
    assert "w_nchw.bin(float32:4,3,3,3)" in text
    nhwc = np.fromfile(out + "/w_nhwc.bin", np.float32).reshape(4, 3, 3, 3)
    np.testing.assert_array_equal(nhwc, w.transpose(0, 2, 3, 1))


def test_convert_fp16(tmp_path):
    data, w, b = _simple_model()
    out = str(tmp_path / "m")
    text = convert(data, out, fp16=True)
    assert "w.bin(float16:2,3)" in text
    saved = np.fromfile(out + "/w.bin", np.float16)
    np.testing.assert_array_equal(saved, w.astype(np.float16).reshape(-1))


def test_convert_quantize(tmp_path):
    rng = np.random.RandomState(0)
    w = rng.randn(16, 16).astype(np.float32)
    nodes = [encode_node("MatMul", ["x", "w"], ["y"], name="mm_0")]
    data = encode_model(nodes, inputs=[("x", (1, 16))], outputs=[("y", (1, 16))],
                        initializers={"w": w})
    out = str(tmp_path / "m")
    text = convert(data, out, quantize=True)
    assert "uint8[" in text

    # quantize math sanity: dequantized values approximate the original
    q = quantize_uint8(w)
    assert q is not None
    qa, scale, zero = q
    deq = (qa.astype(np.float32) - zero) * scale
    assert np.abs(deq - np.clip(w, (0 - zero) * scale, (255 - zero) * scale)).max() < scale


def test_convert_shape_inference_via_ops(tmp_path):
    # no value_info in the file: shapes must come from our op impls
    w = np.random.RandomState(1).rand(3, 5).astype(np.float32)
    nodes = [
        encode_node("MatMul", ["x", "w"], ["t0"], name="mm_0"),
        encode_node("Sigmoid", ["t0"], ["y"], name="sig_0"),
    ]
    data = encode_model(nodes, inputs=[("x", (2, 3))], outputs=[("y", (2, 5))], initializers={"w": w})
    out = str(tmp_path / "m")
    text = convert(data, out)
    assert "t0(2,5)" in text and "y(2,5)" in text


def test_convert_int64_shape_math(tmp_path):
    # Reshape with an int64 initializer folds through the static path
    shape = np.array([4, 2], np.int64)
    nodes = [encode_node("Reshape", ["x", "shp"], ["y"], name="r_0")]
    data = encode_model(nodes, inputs=[("x", (2, 4))], outputs=[("y", (4, 2))],
                        initializers={"shp": shape})
    out = str(tmp_path / "m")
    text = convert(data, out)
    assert "y(4,2)" in text
    assert "shp.bin(int64:2)" in text


def test_cli(tmp_path, capsys):
    from onnxstream_tpu.cli.onnx2txt_main import main

    data, _, _ = _simple_model()
    src = tmp_path / "m.onnx"
    src.write_bytes(data)
    rc = main([str(src), str(tmp_path / "out")])
    assert rc == 0
    assert "2 ops" in capsys.readouterr().out


def test_convert_dynamic_dim_errors_and_override(tmp_path):
    w = np.random.RandomState(0).rand(3, 5).astype(np.float32)
    nodes = [encode_node("MatMul", ["x", "w"], ["y"], name="mm_0")]
    # dim 0 encodes an unknown batch (the writer has no dim_param, 0 == unknown)
    data = encode_model(nodes, inputs=[("x", (0, 3))], outputs=[("y", (0, 5))],
                        initializers={"w": w})
    with pytest.raises(ValueError, match="dynamic/unknown dims"):
        convert(data, str(tmp_path / "m1"))
    text = convert(data, str(tmp_path / "m2"), input_shapes={"x": (2, 3)})
    assert "y(2,5)" in text


def test_shared_weight_divergent_transforms_fork_files(tmp_path):
    """A weight consumed with DIFFERENT transforms must not overwrite one
    .bin with conflicting contents (round-5 review find): quantize turns an
    eligible consumer's ref uint8 while an excluded consumer (Gemm bias,
    input 2) keeps fp32 — the two refs must point at DIFFERENT files, each
    with its own bytes."""
    import os

    s = np.arange(3, dtype=np.float32) + 0.25
    k = (np.arange(9, dtype=np.float32).reshape(3, 3, 1, 1) / 10.0)
    nodes = [
        # eligible: Mul input 1 is quantized under quantize=True
        encode_node("Mul", ["x2", "s"], ["m0"], name="m"),
        # excluded: Conv input 2 (bias) stays fp32 (_QUANT_EXCLUDED)
        encode_node("Conv", ["x", "k", "s"], ["z"], name="c",
                    kernel_shape=[1, 1]),
    ]
    data = encode_model(
        nodes, inputs=[("x", (1, 3, 4, 4)), ("x2", (2, 3))],
        outputs=[("z", (1, 3, 4, 4)), ("m0", (2, 3))],
        initializers={"s": s, "k": k})
    d = str(tmp_path / "m")
    txt = convert(data, d, quantize=True)
    refs = [tok for line in txt.splitlines()
            for tok in line.split("*")[1].split(";") if ".bin" in tok]
    by_file = {}
    for r in refs:
        fn, spec = r.split("(", 1)
        by_file.setdefault(fn, set()).add(spec.split(":")[0])
        assert os.path.exists(os.path.join(d, fn)), fn
    # every file is referenced under exactly ONE dtype, and the uint8 and
    # fp32 views of `s` ended up in distinct files
    for fn, dtypes in by_file.items():
        assert len(dtypes) == 1, (fn, dtypes)
    s_files = [fn for fn in by_file if fn.startswith("s")]
    assert len(s_files) == 2, (s_files, by_file)
