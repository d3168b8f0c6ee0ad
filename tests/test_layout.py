"""NHWC layout pass (runtime/layout.py): parity, pattern coverage, fallbacks."""

import collections

import numpy as np
import pytest

from onnxstream_tpu.convert.builder import GraphBuilder
from onnxstream_tpu.models.sd.unet import build_unet, TINY
from onnxstream_tpu.runtime.config import SessionConfig
from onnxstream_tpu.runtime.layout import rewrite_nhwc
from onnxstream_tpu.runtime.session import Session
from onnxstream_tpu.runtime.weights import DictWeightsProvider


def _run(graph_builder, inputs, **cfg):
    s = Session(config=SessionConfig(**cfg),
                weights_provider=DictWeightsProvider(graph_builder.weights))
    s.read_string(graph_builder.to_text())
    for k, v in inputs.items():
        s.add_tensor(k, v)
    return s, s.run()


def _unet_inputs(rng=None):
    rng = rng or np.random.RandomState(0)
    return {
        "sample": rng.rand(1, 4, 16, 16).astype(np.float32),
        "timestep": np.array([500.0], np.float32),
        "encoder_hidden_states": rng.rand(1, 7, 32).astype(np.float32),
    }


def test_unet_parity_and_patterns():
    g = build_unet(TINY)
    inputs = _unet_inputs()
    _, base = _run(g, inputs, use_nhwc_layout=False, fuse_ops_in_attention=True)
    s, out = _run(g, inputs, use_nhwc_layout=True, fuse_ops_in_attention=True)
    np.testing.assert_allclose(out["out_sample"], base["out_sample"], atol=1e-4)

    c = collections.Counter(op.op_type for op in s.graph.ops)
    assert c["ostpu.groupnorm"] > 0, "GroupNorm clusters must fuse"
    assert c["ostpu.reshape"] > 0, "to_seq/to_sp boundaries must merge"
    # every Conv runs channel-last
    convs = [op for op in s.graph.ops if op.op_type == "Conv"]
    assert convs and all(op.attr("layout") == "NHWC" for op in convs)
    # conv-land transposes are gone: only attention head splits + the two
    # graph-boundary converts remain
    tr = [op for op in s.graph.ops if op.op_type == "Transpose"]
    boundary = [op for op in tr if op.name.endswith("_tonhwc") or op.name.endswith("_tonchw")]
    assert len(boundary) == 2  # sample in, out_sample out


def test_pass_disabled_modes():
    g = build_unet(TINY)
    for cfg in (
        dict(use_nhwc_layout=False),
        dict(use_nchw_convs=True),
        dict(use_uint8_arithmetic=True),
        dict(use_uint8_qdq=True),
        dict(range_data_calibrate=True),
    ):
        graph = rewrite_nhwc(
            __import__("onnxstream_tpu.ir", fromlist=["parse_model_txt"]).parse_model_txt(g.to_text()),
            SessionConfig(**cfg),
        )
        assert all(op.attr("layout") is None for op in graph.ops)


def test_pool_resize_concat_nhwc():
    """Conv -> MaxPool -> AveragePool -> Resize(nearest 2x) -> Concat(skip)."""
    g = GraphBuilder(seed=3)
    x = g.input("x", (1, 8, 12, 12))
    y = g.conv(x, 16, 3, name="c1")
    y = g.emit("MaxPool", [y], [(1, 16, 6, 6)],
               {"kernel_shape": "2,2", "strides": "2,2", "pads": "0,0,0,0"}, name="mp")
    y = g.emit("AveragePool", [y], [(1, 16, 3, 3)],
               {"kernel_shape": "2,2", "strides": "2,2", "pads": "0,0,0,0"}, name="ap")
    y = g.emit("Resize", [y, None, g.weight("sc", np.array([1, 1, 4, 4], np.float32))],
               [(1, 16, 12, 12)],
               {"coordinate_transformation_mode": "asymmetric", "mode": "nearest",
                "nearest_mode": "floor"}, name="rs")
    y = g.concat([y, g.conv(x, 4, 1, pad=0, name="c2")], axis=1, name="cat")
    g.emit("Sigmoid", [y], [y.shape], name="sig", out_names=["out"])

    inputs = {"x": np.random.RandomState(1).rand(1, 8, 12, 12).astype(np.float32)}
    _, base = _run(g, inputs, use_nhwc_layout=False)
    s, out = _run(g, inputs, use_nhwc_layout=True)
    np.testing.assert_allclose(out["out"], base["out"], atol=1e-5)
    types = {op.op_type: op for op in s.graph.ops}
    assert types["MaxPool"].attr("layout") == "NHWC"
    assert types["AveragePool"].attr("layout") == "NHWC"
    assert types["Resize"].attr("layout") == "NHWC"
    assert types["Concat"].attr("axis") == "3"


def test_split_and_global_pool_nhwc():
    g = GraphBuilder(seed=5)
    x = g.input("x", (1, 6, 8, 8))
    y = g.conv(x, 8, 3, name="c")
    a, b = g.split(y, [4, 4], axis=1)
    z = g.emit("GlobalAveragePool", [a], [(1, 4, 1, 1)], name="gap")
    w = g.add(b, z, out_shape=(1, 4, 8, 8), name="bcast")
    g.emit("Relu", [w], [w.shape], name="r", out_names=["out"])
    inputs = {"x": np.random.RandomState(2).rand(1, 6, 8, 8).astype(np.float32)}
    _, base = _run(g, inputs, use_nhwc_layout=False)
    s, out = _run(g, inputs, use_nhwc_layout=True)
    np.testing.assert_allclose(out["out"], base["out"], atol=1e-5)
    types = {op.op_type: op for op in s.graph.ops}
    assert types["Split"].attr("axis") == "3"
    assert types["GlobalAveragePool"].attr("layout") == "NHWC"


def test_unhandled_op_falls_back():
    """A spatial Slice between convs (unhandled by the pass) must force a
    clean NCHW round-trip."""
    g = GraphBuilder(seed=7)
    x = g.input("x", (1, 4, 8, 8))
    y = g.conv(x, 8, 3, name="c1")
    y = g.emit(
        "Slice",
        [y, g.weight("st", np.array([1], np.int64)), g.weight("en", np.array([7], np.int64)),
         g.weight("ax", np.array([2], np.int64))],
        [(1, 8, 6, 8)], name="sl")
    y = g.conv(y, 8, 3, name="c2")
    g.emit("Relu", [y], [y.shape], name="r", out_names=["out"])
    inputs = {"x": np.random.RandomState(3).rand(1, 4, 8, 8).astype(np.float32)}
    _, base = _run(g, inputs, use_nhwc_layout=False)
    s, out = _run(g, inputs, use_nhwc_layout=True)
    np.testing.assert_allclose(out["out"], base["out"], atol=1e-5)
    # the Slice kept its NCHW form; convs around it still run NHWC
    sl = next(op for op in s.graph.ops if op.op_type == "Slice")
    assert sl.attr("layout") is None
    assert all(op.attr("layout") == "NHWC" for op in s.graph.ops if op.op_type == "Conv")


def test_extra_output_inside_conv_land():
    """An extra output naming a mid-graph NHWC-tagged tensor must still fetch
    in its original NCHW shape."""
    g = build_unet(TINY)
    # pick a conv output inside the graph
    target = next(op.outputs[0].name for op in g.ops
                  if op.op_type == "Conv" and op.name == "down0/res0/conv1")
    s = Session(config=SessionConfig(use_nhwc_layout=True),
                weights_provider=DictWeightsProvider(g.weights))
    s.read_string(g.to_text())
    s.add_extra_output(target)
    for k, v in _unet_inputs().items():
        s.add_tensor(k, v)
    out = s.run()
    s2 = Session(config=SessionConfig(use_nhwc_layout=False),
                 weights_provider=DictWeightsProvider(g.weights))
    s2.read_string(g.to_text())
    s2.add_extra_output(target)
    for k, v in _unet_inputs().items():
        s2.add_tensor(k, v)
    base = s2.run()
    assert out[target].shape == base[target].shape
    np.testing.assert_allclose(out[target], base[target], atol=1e-4)


def test_groupnorm_matches_oracle():
    import jax.numpy as jnp

    from onnxstream_tpu.ir import OpNode, TensorSpec
    from onnxstream_tpu.ops import Ctx, get_impl

    rng = np.random.RandomState(0)
    n, c, h, w, groups = 2, 12, 5, 4, 3
    x = rng.randn(n, c, h, w).astype(np.float32)
    scale = rng.rand(groups).astype(np.float32) + 0.5
    bias = rng.randn(groups).astype(np.float32)

    # oracle: the NCHW decomposition semantics
    xr = x.reshape(n, groups, -1)
    mu = xr.mean(-1, keepdims=True)
    var = xr.var(-1, keepdims=True)
    ref = ((xr - mu) / np.sqrt(var + 1e-5) * scale[None, :, None] + bias[None, :, None]).reshape(n, c, h, w)

    op = OpNode("gn", "ostpu.groupnorm",
                [TensorSpec("x"), TensorSpec("s"), TensorSpec("b")],
                [TensorSpec("y")], {"groups": str(groups), "epsilon": "1e-05", "layout": "NHWC"})
    impl = get_impl("ostpu.groupnorm")
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    out = impl.fn(Ctx(jnp, "device", SessionConfig(), "gn"), op,
                  [x_nhwc, jnp.asarray(scale), jnp.asarray(bias)])[0]
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, atol=2e-5)
