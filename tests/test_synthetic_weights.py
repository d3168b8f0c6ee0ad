"""Device-synthesized weights (SessionConfig.synthetic_device_weights) and
lazy builder placeholders (GraphBuilder lazy_weights / LazyArray).

The machinery that finally lets bench.py's TinyLlama child run within a
driver budget: big float weights generate ON DEVICE in one jitted program and
the host never materializes them (VERDICT r3 #1). These tests pin the
contract: synthesis fires for big-enough weights, small/control tensors stay
real, the lazy placeholders materialize if (and only if) something actually
host-reads them, and the s8/u8 quantized forms synthesize with usable qparams.
"""

import numpy as np
import pytest

from onnxstream_tpu.convert.builder import GraphBuilder, LazyArray
from onnxstream_tpu.dtypes import DType
from onnxstream_tpu.ir import parse_model_txt
from onnxstream_tpu.runtime.config import SessionConfig
from onnxstream_tpu.runtime.session import Session
from onnxstream_tpu.runtime.weights import DictWeightsProvider


def _graph():
    g = GraphBuilder(seed=0, lazy_weights=True)
    x = g.input("x", (4, 512))
    y = g.matmul_w(x, 512, name="fc1", bias=False)  # 512x512 = 2^18 elements
    y = g.matmul_w(y, 32, name="fc2", bias=True)    # small: must stay real
    return g, y


def test_lazy_array_contract():
    calls = []

    def make():
        calls.append(1)
        return np.ones((8, 4), np.float32)

    la = LazyArray((8, 4), np.float32, make)
    assert la.shape == (8, 4) and la.ndim == 2 and la.size == 32 and la.nbytes == 128
    assert not calls, "declared metadata must not materialize"
    a = np.asarray(la)
    assert calls == [1] and a.shape == (8, 4)
    np.testing.assert_array_equal(la.materialize(), a)
    assert calls == [1], "materialize() must cache"


def test_synthetic_session_skips_host_generation():
    g, y = _graph()
    big = "fc1.weight.bin"
    assert isinstance(g.weights[big], LazyArray)
    s = Session(
        config=SessionConfig(synthetic_device_weights=True),
        weights_provider=DictWeightsProvider(g.weights),
    )
    s.read_string(g.to_text())
    s.add_tensor("x", np.random.RandomState(0).rand(4, 512).astype(np.float32))
    out = s.run()
    (v,) = out.values()
    assert v.shape == (4, 32) and np.isfinite(v).all()
    assert g.weights[big]._arr is None, "big weight must not materialize on host"
    # the small fc2 weights are below synthetic_min_elements -> real
    ex = s._executor()
    kinds = {w.name: ex._synth_kind(w) for w in ex.plan.arg_weights}
    assert kinds[big] == "normal"
    assert kinds.get("fc2.weight.bin") is None


def test_without_flag_lazy_weights_materialize():
    g, y = _graph()
    s = Session(config=SessionConfig(), weights_provider=DictWeightsProvider(g.weights))
    s.read_string(g.to_text())
    s.add_tensor("x", np.random.RandomState(0).rand(4, 512).astype(np.float32))
    out = s.run()
    (v,) = out.values()
    assert v.shape == (4, 32) and np.isfinite(v).all()
    assert g.weights["fc1.weight.bin"]._arr is not None, "fallback must materialize"


def test_synthetic_s8_symmetric_kind():
    g, y = _graph()
    s = Session(
        config=SessionConfig(
            synthetic_device_weights=True,
            force_uint8_storage_set={"fc1.weight.bin"},
            int8_symmetric_storage=True,
        ),
        weights_provider=DictWeightsProvider(g.weights),
    )
    s.read_string(g.to_text())
    s.add_tensor("x", np.random.RandomState(0).rand(4, 512).astype(np.float32))
    out = s.run()
    (v,) = out.values()
    assert v.shape == (4, 32) and np.isfinite(v).all()
    assert g.weights["fc1.weight.bin"]._arr is None
    ex = s._executor()
    w = next(w for w in ex.plan.arg_weights if w.name == "fc1.weight.bin")
    assert w.symmetric and w.quant is not None
    scale, zp = w.quant
    assert np.shape(scale) == (512,) and zp == 0.0


def test_synthetic_u8_quantized_text():
    g, y = _graph()
    text = g.to_text()
    gq = parse_model_txt(text)
    for op in gq.ops:
        for t in op.inputs:
            if t.name == "fc1.weight.bin":
                t.dtype = DType.uint8
                t.scale, t.zero_point = 0.01, 128
    s = Session(
        config=SessionConfig(synthetic_device_weights=True),
        weights_provider=DictWeightsProvider(g.weights),
    )
    s.read_string(gq.to_text())
    s.add_tensor("x", np.random.RandomState(0).rand(4, 512).astype(np.float32))
    out = s.run()
    (v,) = out.values()
    assert v.shape == (4, 32) and np.isfinite(v).all()
    assert g.weights["fc1.weight.bin"]._arr is None
    ex = s._executor()
    w = next(w for w in ex.plan.arg_weights if w.name == "fc1.weight.bin")
    assert ex._synth_kind(w) == "u8"
