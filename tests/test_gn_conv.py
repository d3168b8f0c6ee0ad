"""Fused GroupNorm+SiLU+Conv3x3: kernel vs oracle, fusion pass, upload
transform, and session-level parity (interpret mode on the CPU backend)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from onnxstream_tpu.kernels.gn_conv import (
    gn_silu_conv_pallas,
    gn_silu_conv_reference,
    oihw_to_w9,
    w9_to_oihw,
)


@pytest.mark.parametrize(
    "n,c,g,h,w,o,bias",
    [
        (2, 16, 4, 5, 7, 16, True),   # odd spatial: border masks on every edge
        (1, 32, 8, 8, 8, 24, False),  # no bias, O != C
        (1, 20, 4, 4, 4, 8, True),    # C/G = 5 (non-8-divisible group width)
    ],
)
def test_kernel_matches_oracle(n, c, g, h, w, o, bias):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, c, h, w).astype(np.float32))
    sg = jnp.asarray(rng.rand(g).astype(np.float32) + 0.5)
    sb = jnp.asarray(rng.randn(g).astype(np.float32))
    gamma = jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)
    beta = jnp.asarray(rng.randn(c).astype(np.float32))
    wt = 0.1 * rng.randn(o, c, 3, 3).astype(np.float32)
    w9 = jnp.asarray(oihw_to_w9(wt))
    bv = jnp.asarray(rng.randn(o).astype(np.float32)) if bias else None
    ref = gn_silu_conv_reference(x, sg, sb, gamma, beta, w9, bv, g, 1e-5)
    out = gn_silu_conv_pallas(x, sg, sb, gamma, beta, w9, bv, groups=g,
                              eps=1e-5, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_w9_transform_roundtrip():
    rng = np.random.RandomState(1)
    wt = rng.randn(24, 16, 3, 3).astype(np.float32)
    back = np.asarray(w9_to_oihw(jnp.asarray(oihw_to_w9(wt))))
    np.testing.assert_array_equal(back, wt)

    from onnxstream_tpu.runtime.planner import WEIGHT_TRANSFORMS

    np.testing.assert_array_equal(WEIGHT_TRANSFORMS["t9oc"](wt), oihw_to_w9(wt))


def _build_chain_graph():
    """gn -> silu -> conv3x3 (fusable) followed by gn -> silu -> conv1x1
    (not fusable: 1x1) and a strided conv3x3 (not fusable: s2)."""
    from onnxstream_tpu.convert.builder import GraphBuilder

    gb = GraphBuilder(seed=11)
    x = gb.input("x", (2, 32, 8, 8))
    h = gb.group_norm(x, groups=8, name="gn1")
    h = gb.silu(h)
    h = gb.conv(h, 32, k=3, name="conv1")
    h = gb.group_norm(h, groups=8, name="gn2")
    h = gb.silu(h)
    h = gb.conv(h, 32, k=1, name="conv2")  # 1x1: stays decomposed
    h = gb.group_norm(h, groups=8, name="gn3")
    h = gb.silu(h)
    h = gb.conv(h, 32, k=3, stride=2, name="conv3")  # s2: stays decomposed
    # non-trivial affines so the fused normalize path is actually exercised
    rng = np.random.RandomState(3)
    for nm in ("gn1", "gn2", "gn3"):
        gb.weights[nm + ".weight"] = (
            rng.rand(32, 1, 1).astype(np.float32) + 0.5)
        gb.weights[nm + ".bias"] = 0.3 * rng.randn(32, 1, 1).astype(np.float32)
        gb.weights[nm + ".inorm_scale"] = (
            rng.rand(8).astype(np.float32) + 0.5)
        gb.weights[nm + ".inorm_bias"] = 0.2 * rng.randn(8).astype(np.float32)
    return gb


def test_fusion_pattern_selectivity_and_session_parity():
    from onnxstream_tpu.runtime.config import SessionConfig
    from onnxstream_tpu.runtime.session import Session
    from onnxstream_tpu.runtime.weights import DictWeightsProvider

    gb = _build_chain_graph()
    text = gb.to_text()
    rng = np.random.RandomState(0)
    xv = rng.randn(2, 32, 8, 8).astype(np.float32)

    outs = {}
    for tag, cfg in (
        ("xla", SessionConfig()),
        ("fused", SessionConfig(fuse_gn_conv=True, pallas_interpret=True)),
    ):
        s = Session(config=cfg, weights_provider=DictWeightsProvider(dict(gb.weights)))
        s.read_string(text)
        if tag == "fused":
            kinds = [op.op_type for op in s.graph.ops]
            assert kinds.count("ostpu.gn_silu_conv") == 1  # only the 3x3 s1
            fused = next(op for op in s.graph.ops
                         if op.op_type == "ostpu.gn_silu_conv")
            w_spec = fused.inputs[5]
            assert w_spec.transform == "t9oc"
            assert tuple(w_spec.shape) == (9, 32, 32)
            assert tuple(w_spec.file_shape) == (32, 32, 3, 3)
            # the other two chains keep their decomposed InstanceNormalization
            assert kinds.count("InstanceNormalization") == 2
        s.add_tensor("x", xv)
        outs[tag] = next(iter(s.run().values()))
        s.close()
    np.testing.assert_allclose(outs["fused"], outs["xla"], rtol=2e-4, atol=2e-4)


def test_fused_eager_matches_jit():
    from onnxstream_tpu.runtime.config import SessionConfig
    from onnxstream_tpu.runtime.session import Session
    from onnxstream_tpu.runtime.weights import DictWeightsProvider

    gb = _build_chain_graph()
    cfg = SessionConfig(fuse_gn_conv=True, pallas_interpret=True)
    s = Session(config=cfg, weights_provider=DictWeightsProvider(dict(gb.weights)))
    s.read_string(gb.to_text())
    xv = np.random.RandomState(5).randn(2, 32, 8, 8).astype(np.float32)
    s.add_tensor("x", xv)
    jit_out = next(iter(s.run().values()))
    eager_out = next(iter(s.run(eager=True).values()))
    np.testing.assert_allclose(eager_out, jit_out, rtol=1e-4, atol=1e-4)
    s.close()


def test_fusion_skips_shared_weight():
    """A conv weight consumed by two ops cannot be relayouted for one."""
    from onnxstream_tpu.convert.builder import GraphBuilder
    from onnxstream_tpu.runtime.config import SessionConfig
    from onnxstream_tpu.runtime.session import Session
    from onnxstream_tpu.runtime.weights import DictWeightsProvider

    gb = GraphBuilder(seed=2)
    x = gb.input("x", (1, 16, 4, 4))
    h = gb.group_norm(x, groups=4, name="gn1")
    h = gb.silu(h)
    wspec = gb.weight("wshared", gb.randn(16, 16, 3, 3))
    c1 = gb.emit("Conv", [h, wspec], [(1, 16, 4, 4)],
                 {"dilations": "1,1", "group": 1, "kernel_shape": "3,3",
                  "pads": "1,1,1,1", "strides": "1,1"}, name="convA")
    c2 = gb.emit("Conv", [x, wspec], [(1, 16, 4, 4)],
                 {"dilations": "1,1", "group": 1, "kernel_shape": "3,3",
                  "pads": "1,1,1,1", "strides": "1,1"}, name="convB")
    out = gb.add(c1, c2)
    cfg = SessionConfig(fuse_gn_conv=True, pallas_interpret=True)
    s = Session(config=cfg, weights_provider=DictWeightsProvider(dict(gb.weights)))
    s.read_string(gb.to_text())
    assert all(op.op_type != "ostpu.gn_silu_conv" for op in s.graph.ops)
    s.close()
