"""W8A8 quantized matmul: kernel vs exact int32 oracle, runtime wiring."""

import numpy as np
import pytest

from onnxstream_tpu.kernels.qmatmul import (
    qmatmul,
    qmatmul_reference,
    quantize_activation,
)


@pytest.mark.parametrize("shape", [(64, 200, 96), (8, 128, 128), (1, 40, 300)])
def test_qmatmul_float_out_matches_oracle(shape):
    M, K, N = shape
    rng = np.random.RandomState(0)
    a = rng.randint(0, 256, (M, K)).astype(np.uint8)
    w = rng.randint(0, 256, (K, N)).astype(np.uint8)
    y = np.asarray(qmatmul(a, w, 0.02, 110, 0.015, 128, interpret=True))
    ref = qmatmul_reference(a, w, 0.02, 110, 0.015, 128)
    assert np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9) < 1e-5


def test_qmatmul_u8_out_bit_exact():
    rng = np.random.RandomState(1)
    a = rng.randint(0, 256, (32, 150)).astype(np.uint8)
    w = rng.randint(0, 256, (150, 64)).astype(np.uint8)
    bias = rng.randn(64).astype(np.float32) * 50
    y = np.asarray(qmatmul(a, w, 0.05, 90, 0.01, 120, out_scale=0.1, out_zero=128,
                           bias=bias, interpret=True))
    ref = qmatmul_reference(a, w, 0.05, 90, 0.01, 120, out_scale=0.1, out_zero=128, bias=bias)
    assert (np.abs(y.astype(int) - ref.astype(int)) <= 1).all()
    assert (y == ref).mean() > 0.999


def test_qmatmul_batched():
    rng = np.random.RandomState(2)
    a = rng.randint(0, 256, (2, 8, 100)).astype(np.uint8)
    w = rng.randint(0, 256, (100, 48)).astype(np.uint8)
    y = np.asarray(qmatmul(a, w, 0.02, 100, 0.03, 128, interpret=True))
    assert y.shape == (2, 8, 48)
    ref = qmatmul_reference(a, w, 0.02, 100, 0.03, 128)
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-4)


def test_quantize_activation_roundtrip():
    import jax.numpy as jnp

    x = np.linspace(-2, 3, 64).astype(np.float32)
    scale, zero = 5.0 / 255.0, 102
    q = np.asarray(quantize_activation(jnp.asarray(x), scale, zero))
    deq = (q.astype(np.float32) - zero) * scale
    assert np.abs(deq - x).max() <= scale / 2 + 1e-6


@pytest.mark.parametrize("shape,dtype", [((1, 96, 256), np.float32), ((200, 128, 64), np.float32), ((2, 7, 100, 48), "bfloat16")])
def test_w8_matmul_matches_dequant_oracle(shape, dtype):
    """Weight-only kernel == dequantize-then-dot, to float rounding."""
    import jax.numpy as jnp

    from onnxstream_tpu.kernels.qmatmul import w8_matmul

    *lead, K, N = shape
    rng = np.random.RandomState(7)
    a = rng.randn(*lead, K).astype(np.float32)
    w = rng.randint(0, 256, (K, N)).astype(np.uint8)
    sw, zw = 0.013, 117
    y = np.asarray(
        w8_matmul(jnp.asarray(a, dtype), jnp.asarray(w), sw, zw, interpret=True),
        np.float32,
    )
    ref = a.astype(np.float64) @ ((w.astype(np.float64) - zw) * sw)
    tol = 5e-2 if dtype == "bfloat16" else 1e-4
    assert y.shape == ref.shape
    assert np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9) < tol


def test_session_w8_matmul_on_off_parity():
    """The executor's weight-only dispatch (use_w8_matmul) must agree with
    the generic dequantize-on-load path it replaces."""
    from onnxstream_tpu.runtime.config import SessionConfig
    from onnxstream_tpu.runtime.quantization import quantize_weight_percentile
    from onnxstream_tpu.runtime.session import Session
    from onnxstream_tpu.runtime.weights import DictWeightsProvider

    rng = np.random.RandomState(11)
    wf = rng.randn(96, 40).astype(np.float32)
    x = rng.randn(3, 5, 96).astype(np.float32)
    wq, scale, zero = quantize_weight_percentile(wf)
    model = f"mm:MatMul*input:x(3,5,96);w.bin(uint8[{scale},{zero}]:96,40)*output:y(3,5,40)\n"

    outs = {}
    for flag in (True, False):
        s = Session(
            config=SessionConfig(use_w8_matmul=flag),
            weights_provider=DictWeightsProvider({"w.bin": wq}),
        )
        s.read_string(model)
        s.add_tensor("x", x)
        outs[flag] = np.asarray(s.run()["y"], np.float32)
    np.testing.assert_allclose(outs[True], outs[False], rtol=1e-4, atol=1e-4)
    ref = x @ ((wf if False else ((wq.astype(np.float32) - zero) * scale)))
    np.testing.assert_allclose(outs[True], ref, rtol=1e-3, atol=1e-3)


def test_llm_pipeline_int8_weights_decode():
    """int8_weights: generation runs through the w8 kernel and stays close to
    the float pipeline on a tiny model."""
    from onnxstream_tpu.models.llm.llama import LLAMA_TINY
    from onnxstream_tpu.models.llm.pipeline import LlamaPipeline

    prompt = list(range(5, 15))
    pf = LlamaPipeline(LLAMA_TINY, seed=3)
    ref_tok = pf.generate(prompt, max_new_tokens=8)
    pq = LlamaPipeline(LLAMA_TINY, seed=3, int8_weights=True)
    q_tok = pq.generate(prompt, max_new_tokens=8)
    # u8 sessions really carry quantized weights
    sess = next(iter(pq._sessions.values()))
    assert sess.config.force_uint8_storage_set
    # same greedy path on a well-conditioned tiny model (weights ~N(0, .02));
    # allow divergence only at the tail if logits are near-ties
    agree = sum(a == b for a, b in zip(ref_tok, q_tok))
    assert agree >= len(ref_tok) - 2, (ref_tok, q_tok)


def test_session_w8a8_matmul_matches_float():
    """Runtime wiring: a calibrated W8A8 MatMul approximates the float run."""
    from onnxstream_tpu.runtime.config import SessionConfig
    from onnxstream_tpu.runtime.quantization import quantize_weight_percentile
    from onnxstream_tpu.runtime.session import Session
    from onnxstream_tpu.runtime.weights import DictWeightsProvider

    rng = np.random.RandomState(3)
    wf = rng.randn(64, 32).astype(np.float32)
    x = rng.randn(4, 64).astype(np.float32)
    ref = x @ wf

    wq, scale, zero = quantize_weight_percentile(wf)
    model = f"mm:MatMul*input:x(4,64);w.bin(uint8[{scale},{zero}]:64,32)*output:y(4,32)\n"

    lo, hi = float(x.min()), float(x.max())
    cfg = SessionConfig(use_uint8_arithmetic=True, range_data={"mm": (lo, hi)})
    s = Session(config=cfg, weights_provider=DictWeightsProvider({"w.bin": wq}))
    s.read_string(model)
    s.add_tensor("x", x)
    y = np.asarray(s.run()["y"], np.float32)
    # quantization noise bound: ~|x|max * |w|max * sqrt(K) * (scale_a + scale_w)
    err = np.abs(y - ref).max()
    assert err < 1.5, err

    # without the flag the same model dequantizes the weight (W8, float A)
    cfg2 = SessionConfig(use_uint8_arithmetic=False)
    s2 = Session(config=cfg2, weights_provider=DictWeightsProvider({"w.bin": wq}))
    s2.read_string(model)
    s2.add_tensor("x", x)
    y2 = np.asarray(s2.run()["y"], np.float32)
    assert np.abs(y2 - ref).max() < 1.5
