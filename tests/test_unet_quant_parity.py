"""Calibrate -> quantize -> W8A8 UNet parity vs the fp32 oracle.

Same shape of evidence as tests/test_vae_quant_parity.py but on the UNet
graph (the model the W8A8 timing A/B runs at full size on chip,
tools/ab_w8a8_unet.py): an eager calibration pass records per-op percentile
ranges (reference --decoder-calibrate flow, src/onnxstream.cpp:2983-3004),
the weights quantize with the converter's exclusion rules, and the quantized
session must (a) actually take the W8A8 Conv/MatMul dispatch and (b) stay
within quantization tolerance of the fp32 output.
"""

import numpy as np

from onnxstream_tpu.convert.quantize import quantize_graph_weights
from onnxstream_tpu.models.sd.unet import build_unet, TINY
from onnxstream_tpu.runtime.config import SessionConfig
from onnxstream_tpu.runtime.session import Session
from onnxstream_tpu.runtime.weights import DictWeightsProvider


def _run(text, weights, cfg, inputs):
    s = Session(config=cfg, weights_provider=DictWeightsProvider(weights))
    s.read_string(text)
    for k, v in inputs.items():
        s.add_tensor(k, v)
    out = s.run()
    return s, np.asarray(out["out_sample"], np.float32)


def test_w8a8_unet_output_parity():
    g = build_unet(TINY, seed=3)
    text = g.to_text()
    rng = np.random.RandomState(11)
    inputs = {
        "sample": rng.rand(1, TINY.in_channels, TINY.sample_size, TINY.sample_size).astype(np.float32),
        "timestep": np.array([500.0], np.float32),
        "encoder_hidden_states": rng.rand(1, TINY.context_len, TINY.cross_attention_dim).astype(np.float32),
    }

    _, y_f = _run(text, dict(g.weights), SessionConfig(), inputs)
    assert float(y_f.max() - y_f.min()) > 0.1, "degenerate fp32 output"

    # eager calibration pass (reference: m_range_data_calibrate at push time)
    s_c = Session(config=SessionConfig(range_data_calibrate=True),
                  weights_provider=DictWeightsProvider(dict(g.weights)))
    s_c.read_string(text)
    for k, v in inputs.items():
        s_c.add_tensor(k, v)
    s_c.run(eager=True)
    ranges = dict(s_c._executor().range_data.data)
    assert len(ranges) > 10

    qtext, qweights = quantize_graph_weights(text, g.weights)
    n_q = sum(1 for a in qweights.values() if np.asarray(a).dtype == np.uint8)
    assert n_q >= 5, f"expected quantized weights, got {n_q}"

    cfg_q = SessionConfig(use_uint8_arithmetic=True, range_data=ranges)
    s_q, y_q = _run(qtext, qweights, cfg_q, inputs)
    ex = s_q._executor()
    fired = [ex._qlinear_mode(op) for op in ex.graph.ops
             if op.op_type in ("Conv", "MatMul")]
    assert fired.count("conv") >= 3, fired
    assert fired.count("matmul") >= 1, fired

    # quantization tolerance relative to the fp32 output's dynamic range;
    # the tiny random-weight UNet has far worse quantization SNR than the
    # real 860M model (see the VAE test's rationale)
    span = float(y_f.max() - y_f.min())
    d = np.abs(y_q - y_f)
    assert d.mean() / span < 0.05, (d.mean(), span)
    assert d.max() / span < 0.35, (d.max(), span)
