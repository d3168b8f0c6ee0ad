"""Quantized-VAE image parity: the user-visible certification of the quant
stack.

The reference's qu8 decoder workflow produces an image users judge directly
(src/sd.cpp:1174-1256: read range_data.txt, run the uint8-weight decoder with
W8A8 convs). This test reproduces that acceptance at the artifact level:
decode the SAME golden latents through the fp32 VAE and through the
calibrate -> quantize-weights -> W8A8-conv VAE, and assert image-level
tolerance on the final uint8 image.
"""

import numpy as np
import pytest

from onnxstream_tpu.convert.quantize import quantize_graph_weights
from onnxstream_tpu.models.sd.vae import VAE_TINY, build_vae_decoder
from onnxstream_tpu.runtime.config import SessionConfig
from onnxstream_tpu.runtime.session import Session
from onnxstream_tpu.runtime.weights import DictWeightsProvider


def _decode(text, weights, cfg, z):
    s = Session(config=cfg, weights_provider=DictWeightsProvider(weights))
    s.read_string(text)
    s.add_tensor("latent", z)
    out = s.run()
    return s, np.asarray(next(v for v in out.values() if v.ndim == 4), np.float32)


def _to_image(x):
    """The pipeline's output mapping (models/sd/pipeline.py decode())."""
    img = (x[0].transpose(1, 2, 0) + 1.0) * 127.5
    return np.clip(img, 0, 255).astype(np.uint8)


def test_qu8_vae_decode_image_parity():
    g = build_vae_decoder(VAE_TINY, seed=7)
    text = g.to_text()
    weights = g.weights
    rng = np.random.RandomState(42)
    z = rng.randn(1, 4, 8, 8).astype(np.float32)

    # fp32 reference decode
    s_f, y_f = _decode(text, dict(weights), SessionConfig(), z)
    img_f = _to_image(y_f)
    # the synthetic decoder must produce a non-trivial image, otherwise the
    # parity assertion would be vacuous
    assert float(y_f.max() - y_f.min()) > 0.5, "degenerate fp32 output"

    # calibration pass (reference --decoder-calibrate: eager run recording
    # percentile ranges per op, src/onnxstream.cpp:2983-3004)
    cfg_cal = SessionConfig(range_data_calibrate=True)
    s_c = Session(config=cfg_cal, weights_provider=DictWeightsProvider(dict(weights)))
    s_c.read_string(text)
    s_c.add_tensor("latent", z)
    s_c.run(eager=True)
    ranges = dict(s_c._executor().range_data.data)
    assert len(ranges) > 5

    # quantize the weights (notebook exclusions) and run the W8A8 decoder
    qtext, qweights = quantize_graph_weights(text, weights)
    n_q = sum(1 for a in qweights.values() if np.asarray(a).dtype == np.uint8)
    assert n_q >= 5, f"expected conv weights quantized, got {n_q}"
    cfg_q = SessionConfig(use_uint8_arithmetic=True, range_data=ranges)
    s_q, y_q = _decode(qtext, qweights, cfg_q, z)
    # the W8A8 conv dispatch actually fired (not the dequant fallback)
    ex = s_q._executor()
    fired = [ex._qlinear_mode(op) for op in ex.graph.ops if op.op_type == "Conv"]
    assert fired.count("conv") >= 3, fired
    img_q = _to_image(y_q)

    # image-level acceptance. The tiny 16-channel random-weight VAE has a
    # much worse quantization SNR than the real 512-channel decoder (fewer
    # channels to average over, random weights with no structure), so the
    # bounds here are ~2x the real-model target (mean 2/255, max 16/255);
    # measured on this fixture: mean ~2.6, max ~14.
    d = np.abs(img_q.astype(np.int32) - img_f.astype(np.int32))
    assert d.mean() < 4.0, d.mean()
    assert d.max() < 32, d.max()


def test_qu8_vae_without_ranges_still_decodes():
    """The same quantized model without calibration data falls back to
    dequantize-weights float convs and stays close to fp32 (the reference
    requires range_data for its qu8 path; the fallback here is strictly
    more forgiving)."""
    g = build_vae_decoder(VAE_TINY, seed=7)
    text = g.to_text()
    weights = g.weights
    rng = np.random.RandomState(42)
    z = rng.randn(1, 4, 8, 8).astype(np.float32)
    _, y_f = _decode(text, dict(weights), SessionConfig(), z)
    qtext, qweights = quantize_graph_weights(text, weights)
    _, y_q = _decode(qtext, qweights, SessionConfig(), z)
    d = np.abs(_to_image(y_q).astype(np.int32) - _to_image(y_f).astype(np.int32))
    assert d.mean() < 2.0 and d.max() < 16, (d.mean(), d.max())
