"""W8A8 quantized convolution: kernel vs exact int32 oracle, runtime wiring,
use_uint8_qdq intermediates (reference src/onnxstream.cpp:4631-4689, 3022-3034)."""

import numpy as np
import pytest

from onnxstream_tpu.kernels.qconv import qconv, qconv_reference


@pytest.mark.parametrize(
    "case",
    [
        dict(x=(1, 8, 12, 12), w=(16, 8, 3, 3), strides=(1, 1), pads=(1, 1, 1, 1), dil=(1, 1)),
        dict(x=(2, 4, 9, 11), w=(8, 4, 1, 1), strides=(1, 1), pads=(0, 0, 0, 0), dil=(1, 1)),
        dict(x=(1, 3, 16, 16), w=(6, 3, 3, 3), strides=(2, 2), pads=(1, 1, 1, 1), dil=(1, 1)),
        dict(x=(1, 5, 14, 14), w=(7, 5, 3, 3), strides=(1, 1), pads=(2, 2, 2, 2), dil=(2, 2)),
    ],
)
def test_qconv_float_out_matches_oracle(case):
    rng = np.random.RandomState(0)
    x = rng.randint(0, 256, case["x"]).astype(np.uint8)
    w = rng.randint(0, 256, case["w"]).astype(np.uint8)
    bias = (rng.randn(case["w"][0]) * 30).astype(np.float32)
    kw = dict(strides=case["strides"], pads=case["pads"], dilations=case["dil"], bias=bias)
    y = np.asarray(qconv(x, w, 0.03, 120, 0.02, 128, interpret=True, **kw))
    ref = qconv_reference(x, w, 0.03, 120, 0.02, 128, **kw)
    assert y.shape == ref.shape
    assert np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9) < 1e-5


def test_qconv_u8_out_near_bit_exact():
    rng = np.random.RandomState(1)
    x = rng.randint(0, 256, (1, 6, 10, 10)).astype(np.uint8)
    w = rng.randint(0, 256, (12, 6, 3, 3)).astype(np.uint8)
    bias = (rng.randn(12) * 100).astype(np.float32)
    kw = dict(strides=(1, 1), pads=(1, 1, 1, 1), dilations=(1, 1), bias=bias,
              out_scale=0.7, out_zero=110)
    y = np.asarray(qconv(x, w, 0.05, 90, 0.01, 115, interpret=True, **kw))
    ref = qconv_reference(x, w, 0.05, 90, 0.01, 115, **kw)
    assert (np.abs(y.astype(int) - ref.astype(int)) <= 1).all()
    assert (y == ref).mean() > 0.999


def _calibrated_conv_session():
    """Two-conv net with SiLU between: calibrate ranges on the float path,
    return (model text, float weights, quantized weights, ranges, input)."""
    from onnxstream_tpu.runtime.config import SessionConfig
    from onnxstream_tpu.runtime.quantization import quantize_weight_percentile
    from onnxstream_tpu.runtime.session import Session
    from onnxstream_tpu.runtime.weights import DictWeightsProvider

    rng = np.random.RandomState(3)
    w1 = (rng.randn(8, 4, 3, 3) * 0.3).astype(np.float32)
    b1 = (rng.randn(8) * 0.1).astype(np.float32)
    w2 = (rng.randn(4, 8, 3, 3) * 0.3).astype(np.float32)
    b2 = (rng.randn(4) * 0.1).astype(np.float32)
    x = rng.randn(1, 4, 16, 16).astype(np.float32)

    def model(wspec1, wspec2):
        return (
            f"c1:Conv*input:x(1,4,16,16);{wspec1};b1.bin(float32:8)*output:h(1,8,16,16)*pads:1,1,1,1\n"
            "s1:Sigmoid*input:h(1,8,16,16)*output:hs(1,8,16,16)\n"
            "m1:Mul*input:h(1,8,16,16);hs(1,8,16,16)*output:hm(1,8,16,16)\n"
            f"c2:Conv*input:hm(1,8,16,16);{wspec2};b2.bin(float32:4)*output:y(1,4,16,16)*pads:1,1,1,1\n"
        )

    # float oracle + calibration
    cfg = SessionConfig(range_data_calibrate=True)
    s = Session(config=cfg, weights_provider=DictWeightsProvider(
        {"w1.bin": w1, "b1.bin": b1, "w2.bin": w2, "b2.bin": b2}))
    s.read_string(model("w1.bin(float32:8,4,3,3)", "w2.bin(float32:4,8,3,3)"))
    s.add_tensor("x", x)
    y_ref = np.asarray(s.run(eager=True)["y"], np.float32)
    ranges = dict(s._executor().range_data.data)
    assert "c1" in ranges and "c2" in ranges and "m1" in ranges

    q1, sc1, zp1 = quantize_weight_percentile(w1)
    q2, sc2, zp2 = quantize_weight_percentile(w2)
    qmodel = model(
        f"w1.bin(uint8[{sc1},{zp1}]:8,4,3,3)", f"w2.bin(uint8[{sc2},{zp2}]:4,8,3,3)"
    )
    qweights = {"w1.bin": q1, "b1.bin": b1, "w2.bin": q2, "b2.bin": b2}
    # calibration records graph input x's range under its tensor name
    assert "x" in ranges
    return qmodel, qweights, ranges, x, y_ref


def test_session_w8a8_conv_matches_float():
    """Runtime wiring: the calibrated qu8 conv net (the VAE-decoder pattern)
    runs int convs through the Pallas path and stays within quant tolerance
    of the float run."""
    from onnxstream_tpu.runtime.config import SessionConfig
    from onnxstream_tpu.runtime.session import Session
    from onnxstream_tpu.runtime.weights import DictWeightsProvider

    qmodel, qweights, ranges, x, y_ref = _calibrated_conv_session()
    cfg = SessionConfig(use_uint8_arithmetic=True, range_data=ranges)
    s = Session(config=cfg, weights_provider=DictWeightsProvider(qweights))
    s.read_string(qmodel)
    s.add_tensor("x", x)
    y = np.asarray(s.run()["y"], np.float32)
    err = np.abs(y - y_ref)
    assert err.max() < 0.5 and err.mean() < 0.08, (err.max(), err.mean())
    # sanity: the W8A8 dispatch actually fired for both convs
    ex = s._executor()
    modes = [ex._qlinear_mode(op) for op in ex.graph.ops if op.op_type == "Conv"]
    assert modes == ["conv", "conv"]


def test_session_uint8_qdq_intermediates():
    """use_uint8_qdq degrades intermediates to u8 precision but the output
    stays within quant tolerance; the flag changes the result (it is not a
    no-op) and respects the single-use skip rule."""
    from onnxstream_tpu.runtime.config import SessionConfig
    from onnxstream_tpu.runtime.session import Session
    from onnxstream_tpu.runtime.weights import DictWeightsProvider

    qmodel, qweights, ranges, x, y_ref = _calibrated_conv_session()
    cfg = SessionConfig(use_uint8_qdq=True, range_data=ranges)
    s = Session(config=cfg, weights_provider=DictWeightsProvider(qweights))
    s.read_string(qmodel)
    s.add_tensor("x", x)
    y = np.asarray(s.run()["y"], np.float32)
    assert np.abs(y - y_ref).max() < 0.5

    ex = s._executor()
    # h feeds both s1 (next op) and m1 -> refcount 2 -> quantized;
    # hs is single-use and consumed by the immediately-next op -> skipped
    assert "hs" in ex._qdq_skip
    assert "h" not in ex._qdq_skip

    # same flag without calibration data: in-graph percentile fallback
    cfg2 = SessionConfig(use_uint8_qdq=True)
    s2 = Session(config=cfg2, weights_provider=DictWeightsProvider(qweights))
    s2.read_string(qmodel)
    s2.add_tensor("x", x)
    y2 = np.asarray(s2.run()["y"], np.float32)
    assert np.abs(y2 - y_ref).max() < 0.5
