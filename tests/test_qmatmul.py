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


def test_w8_matmul_per_channel_matches_oracle():
    import jax.numpy as jnp

    from onnxstream_tpu.kernels.qmatmul import w8_matmul

    rng = np.random.RandomState(9)
    K, N = 160, 72
    a = rng.randn(6, K).astype(np.float32)
    w = rng.randint(0, 256, (K, N)).astype(np.uint8)
    sw = rng.uniform(0.001, 0.05, N).astype(np.float32)
    zw = rng.randint(0, 256, N).astype(np.float32)
    y = np.asarray(w8_matmul(jnp.asarray(a), jnp.asarray(w), sw, zw, interpret=True))
    ref = a.astype(np.float64) @ ((w.astype(np.float64) - zw) * sw)
    assert np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9) < 1e-4


def test_per_channel_quantization_beats_per_tensor():
    """Columns with wildly different magnitudes: per-channel round-trip error
    must be much smaller; scalar path must match get_percentiles exactly."""
    from onnxstream_tpu.runtime.quantization import (
        dequantize,
        quantize_weight_percentile,
        quantize_weight_percentile_per_channel,
    )

    rng = np.random.RandomState(4)
    w = rng.randn(512, 16).astype(np.float32) * np.logspace(-2, 1, 16, dtype=np.float32)
    qt, s_t, z_t = quantize_weight_percentile(w)
    qc, s_c, z_c = quantize_weight_percentile_per_channel(w)
    err_t = np.abs(dequantize(qt, s_t, z_t) - w).mean()
    err_c = np.abs((qc.astype(np.float32) - z_c) * s_c - w).mean()
    assert err_c < err_t / 3, (err_c, err_t)
    # each column's params equal the scalar function applied to that column
    for j in (0, 7, 15):
        qj, sj, zj = quantize_weight_percentile(w[:, j])
        assert np.isclose(s_c[j], sj) and z_c[j] == zj
        np.testing.assert_array_equal(qc[:, j], qj)


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
    """int8_weights: prefill AND decode graphs run through the w8 kernel and
    their logits stay close to the float pipeline. (Greedy tokens are NOT
    compared: the synthetic random-weight model has near-tie logits — the
    float top-2 margin is smaller than any quantization error, so token
    agreement would be a coin flip, not a correctness signal.)"""
    import numpy as np

    from onnxstream_tpu.models.llm.llama import LLAMA_TINY
    from onnxstream_tpu.models.llm.pipeline import LlamaPipeline

    prompt = list(range(5, 15))
    logits = {}
    for mode in ("float", "int8"):
        p = LlamaPipeline(LLAMA_TINY, seed=3, int8_weights=(mode == "int8"))
        _, l1 = p.forward(prompt)
        _, l2 = p.forward([118])  # same fed token: isolates logit error
        logits[mode] = (np.asarray(l1, np.float32), np.asarray(l2, np.float32))
        if mode == "int8":
            # u8 weights really are u8 in every session's plan
            for sess in p._sessions.values():
                ex = sess._executor()
                assert sum(1 for w in ex.plan.arg_weights if w.quant is not None) > 0
    for lf, lq in zip(logits["float"], logits["int8"]):
        rel = np.abs(lq - lf).max() / (np.abs(lf).max() + 1e-9)
        assert rel < 0.05, rel


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


# ---------------------------------------------------------------------------
# Dynamic-activation s8 x s8 decode path (int8_symmetric_storage +
# use_w8a8_dyn_matmul)


def _dyn_oracle(a, w_s8, w_scale):
    """NumPy oracle of w8a8_dyn_matmul's exact math: per-row symmetric s8
    activation quant, exact int32 dot, (row x col) scale epilogue."""
    a2 = np.asarray(a, np.float32).reshape(-1, a.shape[-1])
    amax = np.abs(a2).max(axis=1, keepdims=True)
    sa = np.maximum(amax, 1e-12) / 127.0
    aq = np.clip(np.round(a2 / sa), -127, 127).astype(np.int32)
    acc = aq @ np.asarray(w_s8, np.int32)
    out = acc.astype(np.float32) * sa * np.asarray(w_scale, np.float32).reshape(1, -1)
    return out.reshape(a.shape[:-1] + (w_s8.shape[-1],))


@pytest.mark.parametrize(
    "shape,per_channel",
    [
        ((1, 96, 256), False),   # M=1: the decode shape
        ((1, 100, 300), True),   # non-pow2 K/N
        ((40, 200, 96), True),
        ((2, 7, 100, 48), True),  # 3-D batch
    ],
)
def test_w8a8_dyn_matmul_matches_oracle(shape, per_channel):
    import jax.numpy as jnp

    from onnxstream_tpu.kernels.qmatmul import w8a8_dyn_matmul

    *lead, M, K, N = (1,) * (3 - len(shape)) + shape if len(shape) == 3 else shape
    if len(shape) == 3:
        M, K, N = shape
        a = np.random.RandomState(0).randn(M, K).astype(np.float32)
    else:
        a = np.random.RandomState(0).randn(*shape[:-1]).astype(np.float32)
        K, N = shape[-2], shape[-1]
    rng = np.random.RandomState(1)
    w = rng.randint(-127, 128, (K, N)).astype(np.int8)
    ws = (rng.rand(N).astype(np.float32) * 0.02 + 0.001) if per_channel else 0.013
    y = np.asarray(w8a8_dyn_matmul(jnp.asarray(a), jnp.asarray(w), ws, interpret=True))
    ref = _dyn_oracle(a, w, np.broadcast_to(np.asarray(ws, np.float32), (N,)))
    assert y.shape == ref.shape
    rel = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 2e-5, rel


def test_quantize_weight_symmetric_roundtrip():
    from onnxstream_tpu.runtime.quantization import quantize_weight_symmetric_per_channel

    rng = np.random.RandomState(4)
    w = rng.randn(256, 48).astype(np.float32) * np.linspace(0.01, 3.0, 48)
    w[:, 7] = 0.0  # all-zero column: scale must not degenerate
    q, s = quantize_weight_symmetric_per_channel(w)
    assert q.dtype == np.int8 and s.shape == (48,)
    assert (np.abs(q.astype(np.int32)) <= 127).all()
    deq = q.astype(np.float32) * s
    # per-column error bound: half an s8 step of that column's scale
    # (plus the clipped 0.1% tail)
    col_err = np.abs(deq - w)
    col_bound = np.maximum(s * 0.51, np.abs(w).max(axis=0) * 0.002 + 1e-6)
    assert (np.median(col_err, axis=0) <= col_bound).all()
    assert np.abs(deq[:, 7]).max() == 0.0

    # axis=0 variant quantizes per ROW
    q0, s0 = quantize_weight_symmetric_per_channel(w, axis=0)
    assert s0.shape == (256,)
    deq0 = q0.astype(np.float32) * s0[:, None]
    assert np.abs(deq0 - w).mean() < np.abs(w).mean() * 0.01 + 1e-4


def test_session_dyn_s8_matmul_dispatch_and_parity():
    """int8_symmetric_storage + use_w8a8_dyn_matmul: the MatMul weight is
    stored as s8 per-channel and routed through the dynamic kernel; output
    tracks the float matmul within dynamic-quant noise. With the kernel flag
    OFF, the same s8 storage falls back to generic dequantization."""
    from onnxstream_tpu.runtime.config import SessionConfig
    from onnxstream_tpu.runtime.session import Session
    from onnxstream_tpu.runtime.weights import DictWeightsProvider

    rng = np.random.RandomState(5)
    wf = rng.randn(128, 64).astype(np.float32)
    x = rng.randn(1, 128).astype(np.float32)  # decode shape M=1
    ref = x @ wf
    model = "mm:MatMul*input:x(1,128);w.bin(float32:128,64)*output:y(1,64)\n"

    def run(**kw):
        cfg = SessionConfig(
            force_uint8_storage_set={"w.bin"},
            int8_symmetric_storage=True,
            **kw,
        )
        s = Session(config=cfg, weights_provider=DictWeightsProvider({"w.bin": wf.copy()}))
        s.read_string(model)
        s.add_tensor("x", x)
        y = np.asarray(s.run()["y"], np.float32)
        ex = s._executor()
        w = next(w for w in ex.plan.arg_weights if w.name == "w.bin")
        return y, w

    y_on, w_on = run(use_w8a8_dyn_matmul=True)
    assert w_on.symmetric and np.dtype(w_on.upload_dtype) == np.int8
    assert np.ndim(w_on.quant[0]) == 1  # per-channel scale vector
    rel = np.abs(y_on - ref).max() / np.abs(ref).max()
    assert rel < 0.03, rel

    y_off, w_off = run(use_w8a8_dyn_matmul=False)
    assert w_off.symmetric
    rel_off = np.abs(y_off - ref).max() / np.abs(ref).max()
    assert rel_off < 0.02, rel_off  # weight-quant error only (no A8)


@pytest.mark.parametrize("shape,per_channel", [((1, 96, 256), True), ((4, 100, 300), False)])
def test_w8a8_dyn_matmul_xla_matches_oracle(shape, per_channel):
    """The XLA-native dyn-s8 form (the executor's dispatch target) computes
    the same math as the Pallas kernel's oracle."""
    import jax.numpy as jnp

    from onnxstream_tpu.kernels.qmatmul import w8a8_dyn_matmul_xla

    M, K, N = shape
    a = np.random.RandomState(0).randn(M, K).astype(np.float32)
    rng = np.random.RandomState(1)
    w = rng.randint(-127, 128, (K, N)).astype(np.int8)
    ws = (rng.rand(N).astype(np.float32) * 0.02 + 0.001) if per_channel else 0.013
    y = np.asarray(w8a8_dyn_matmul_xla(jnp.asarray(a), jnp.asarray(w), ws))
    ref = _dyn_oracle(a, w, np.broadcast_to(np.asarray(ws, np.float32), (N,)))
    rel = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 2e-5, rel
