"""Tiled Pallas matmul + im2col conv wrapper: kernel vs jnp/lax oracles."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from onnxstream_tpu.kernels.matmul import (
    conv3x3_im2col_pallas,
    matmul_pallas,
    matmul_supported,
)

TPU_TESTS = (
    os.environ.get("OSTPU_TPU_TESTS", "") == "1"
    and jax.default_backend() == "tpu"
)


@pytest.mark.parametrize(
    "m,k,n,bias",
    [
        (64, 1152, 128, False),    # one M block (8x8 level shape class)
        (128, 2560, 256, True),    # multi-K-step with bias
        (512, 1280, 640, True),    # 16x16 level 1x1-conv class
        (256, 11520, 1280, False), # full 9C K sweep (3x3 im2col, C=1280)
    ],
)
def test_matmul_matches_oracle(m, k, n, bias):
    assert matmul_supported(m, k, n)
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(m, k).astype(np.float32), jnp.bfloat16)
    b = jnp.asarray(0.02 * rng.randn(k, n).astype(np.float32), jnp.bfloat16)
    bv = jnp.asarray(rng.randn(n).astype(np.float32)) if bias else None
    ref = jnp.dot(a, b, preferred_element_type=jnp.float32)
    if bias:
        ref = ref + bv
    ref = np.asarray(ref.astype(jnp.float32))
    out = np.asarray(
        matmul_pallas(a, b, bv, out_dtype=jnp.float32, interpret=True)
    )
    # identical contraction in f32 accumulation: tolerances cover only the
    # reduction-order difference across K blocks
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4 * np.sqrt(k / 128))


def test_matmul_bf16_output_rounding():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randn(32, 256).astype(np.float32), jnp.bfloat16)
    b = jnp.asarray(rng.randn(256, 128).astype(np.float32), jnp.bfloat16)
    ref = jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    out = matmul_pallas(a, b, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


@pytest.mark.parametrize("cin,cout,h,w,batch", [(128, 128, 8, 8, 2), (256, 128, 5, 7, 1)])
def test_conv3x3_matches_lax(cin, cout, h, w, batch):
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(batch, h, w, cin).astype(np.float32))
    wt = jnp.asarray(0.05 * rng.randn(cout, cin, 3, 3).astype(np.float32))
    bias = jnp.asarray(rng.randn(cout).astype(np.float32))
    dn = jax.lax.conv_dimension_numbers(x.shape, wt.shape, ("NHWC", "OIHW", "NHWC"))
    ref = jax.lax.conv_general_dilated(
        x, wt, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    ) + bias
    out = conv3x3_im2col_pallas(x, wt, bias, out_dtype=jnp.float32,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


@pytest.mark.skipif(not TPU_TESTS, reason="set OSTPU_TPU_TESTS=1 on a TPU backend")
def test_matmul_on_chip_f32_close():
    """Real-MXU guard (bf16 inputs, f32 accumulate): kernel vs XLA dot."""
    rng = np.random.RandomState(3)
    a = jnp.asarray(rng.randn(256, 11520).astype(np.float32), jnp.bfloat16)
    b = jnp.asarray(0.02 * rng.randn(11520, 1280).astype(np.float32), jnp.bfloat16)
    ref = np.asarray(jnp.dot(a, b, preferred_element_type=jnp.float32))
    out = np.asarray(matmul_pallas(a, b, out_dtype=jnp.float32))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=5e-2)


def test_session_smallconv_dispatch_and_parity():
    """use_pallas_smallconv routes eligible 3x3 convs through the Pallas
    matmul (interpret on CPU) and matches the default XLA conv path."""
    from onnxstream_tpu.convert.builder import GraphBuilder
    from onnxstream_tpu.runtime.config import SessionConfig
    from onnxstream_tpu.runtime.session import Session
    from onnxstream_tpu.runtime.weights import DictWeightsProvider

    gb = GraphBuilder(seed=7)
    x = gb.input("x", (2, 128, 8, 8))
    y = gb.conv(x, 128, k=3)     # eligible: C=O=128, HW=64, s1 p1
    y = gb.conv(y, 130, k=3)     # ineligible (O % 128 != 0): XLA fallback
    text = gb.to_text()
    rng = np.random.RandomState(0)
    xv = rng.randn(2, 128, 8, 8).astype(np.float32)

    outs = {}
    for tag, cfg in (
        ("xla", SessionConfig()),
        ("pallas", SessionConfig(use_pallas_smallconv=True,
                                 pallas_interpret=True)),
    ):
        s = Session(config=cfg, weights_provider=DictWeightsProvider(gb.weights))
        s.read_string(text)
        s.add_tensor("x", xv)
        outs[tag] = next(iter(s.run().values()))
    np.testing.assert_allclose(outs["pallas"], outs["xla"], rtol=2e-4, atol=2e-4)
