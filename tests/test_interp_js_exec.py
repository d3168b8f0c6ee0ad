"""Execute the REAL api/interp.js with the embedded minijs engine.

This is the execution-level gate test_interp_twins.py could not be: the
shipped JavaScript itself — not a hand-ported twin — parses a model.txt,
loads weights, runs the graph, and its outputs are compared against the
Python Session (CPU backend) on the same graph and inputs. A logic bug
anywhere in interp.js (parser, ref-counting pool, op kernels, API layer)
fails this test directly.

Reference counterpart: the in-browser WASM runtime demonstrably executing in
examples/YOLOv8n_wasm/index.html (reference src/wasm.js); here the host is
onnxstream_tpu/minijs (a from-scratch ES2020-subset interpreter) instead of
a browser, so CI needs no node/emscripten.
"""

import os

import numpy as np
import pytest

from onnxstream_tpu.convert.builder import GraphBuilder
from onnxstream_tpu.minijs import Engine
from onnxstream_tpu.runtime.config import SessionConfig
from onnxstream_tpu.runtime.session import Session
from onnxstream_tpu.runtime.weights import DictWeightsProvider

INTERP_JS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "onnxstream_tpu", "api", "interp.js")


def _run_py(text, weights, inputs, out_names):
    s = Session(config=SessionConfig(compute_dtype="float32"),
                weights_provider=DictWeightsProvider(dict(weights)))
    s.read_string(text)
    for k, v in inputs.items():
        s.add_tensor(k, np.asarray(v))
    res = s.run()
    s.close()
    return {n: np.asarray(res[n]) for n in out_names}


def _run_js(text, weights, inputs, out_names):
    eng = Engine()
    eng.run_file(INTERP_JS)
    model = eng.await_(eng.call_method(eng.global_get("InterpModel"), "create"))
    eng.await_(eng.call_method(model, "read_string", text))
    manifest = eng.from_js(eng.await_(eng.call_method(model, "get_weights_names")))
    for part in (manifest.split("|") if manifest else []):
        typ, name = part.split(":", 1)
        arr = weights[name]
        buf = np.ascontiguousarray(
            arr, np.int64 if typ == "int64" else np.float32)
        eng.await_(eng.call_method(model, "add_weights_file", typ, name, buf))
    for k, v in inputs.items():
        v = np.asarray(v)
        if v.dtype == np.int64:
            eng.await_(eng.call_method(model, "add_tensor", k, list(v.shape),
                                       v.reshape(-1), "int64"))
        else:
            eng.await_(eng.call_method(
                model, "add_tensor", k, list(v.shape),
                np.ascontiguousarray(v, np.float32).reshape(-1)))
    eng.await_(eng.call_method(model, "run"))
    out = {}
    for n in out_names:
        t = eng.await_(eng.call_method(model, "get_tensor", n))
        shape = [int(d) for d in eng.from_js(eng.get(t, "shape"))]
        data = eng.from_js(eng.get(t, "data"))
        out[n] = np.asarray(data, np.float32).reshape(shape)
    return out


def _assert_match(py, js, tol=2e-4):
    for n in py:
        assert js[n].shape == py[n].shape, (n, js[n].shape, py[n].shape)
        d = float(np.abs(js[n].astype(np.float64) - py[n].astype(np.float64)).max())
        assert d < tol, f"{n}: max|Δ|={d}"


def test_engine_executes_real_interp_js_conv_net():
    """YOLO-flavored convnet: Conv(+bias, pad) -> Sigmoid -> Mul (SiLU) ->
    MaxPool -> grouped Conv -> Resize + Concat -> Reshape -> Transpose ->
    MatMul -> Softmax, through the genuine interp.js source."""
    g = GraphBuilder(seed=0)
    x = g.input("img", (1, 4, 8, 8))
    c1 = g.conv(x, 8, 3, pad=1, name="c1")
    sg = g.emit("Sigmoid", [c1], [(1, 8, 8, 8)], name="sg")
    silu = g.emit("Mul", [c1, sg], [(1, 8, 8, 8)], name="silu")
    mp = g.emit("MaxPool", [silu], [(1, 8, 4, 4)],
                {"kernel_shape": "2,2", "strides": "2,2"}, name="mp")
    c2 = g.conv(mp, 8, 3, pad=1, groups=2, name="c2")
    up = g.emit("Resize", [mp, None, g.weight("scales", np.array([1, 1, 2, 2], np.float32))],
                [(1, 8, 8, 8)], {"mode": "nearest"}, name="up")
    c1b = g.emit("Concat", [up, silu], [(1, 16, 8, 8)], {"axis": 1}, name="cat")
    rs = g.emit("Reshape", [c1b, g.weight("rs_shape", np.array([1, 16, 64], np.int64))],
                [(1, 16, 64)], name="rs")
    tr = g.emit("Transpose", [rs], [(1, 64, 16)], {"perm": "0,2,1"}, name="tr")
    w = g.weight("mm_w", g.randn(16, 8))
    mm = g.emit("MatMul", [tr, w], [(1, 64, 8)], name="mm")
    sm = g.emit("Softmax", [mm], [(1, 64, 8)], {"axis": "-1"}, name="sm")

    text = g.to_text()
    rng = np.random.RandomState(7)
    inputs = {"img": rng.randn(1, 4, 8, 8).astype(np.float32)}
    outs = [sm.name, c2.name]
    py = _run_py(text, g.weights, inputs, outs)
    js = _run_js(text, g.weights, inputs, outs)
    _assert_match(py, js)


def test_engine_executes_real_interp_js_tensor_ops():
    """Index/shape machinery: Slice, Split, Gather, Where/Greater, Reduce,
    Add/Sub/Div/Pow broadcasting, Unsqueeze/Squeeze/Flatten/Identity."""
    g = GraphBuilder(seed=1)
    x = g.input("x", (2, 3, 8))
    sl = g.emit("Slice", [x, g.weight("st", np.array([1], np.int64)),
                          g.weight("en", np.array([7], np.int64)),
                          g.weight("ax", np.array([2], np.int64))],
                [(2, 3, 6)], name="sl")
    # Slice input 4 (steps): reverse — old interp.js silently step-1'd it
    sl = g.emit("Slice", [sl, g.weight("st2", np.array([5], np.int64)),
                          g.weight("en2", np.array([-(2 ** 50)], np.int64)),
                          g.weight("ax2", np.array([2], np.int64)),
                          g.weight("sp2", np.array([-1], np.int64))],
                [(2, 3, 6)], name="slrev")
    s1, s2 = g.emit("Split", [sl], [(2, 3, 3), (2, 3, 3)],
                    {"axis": "2", "split": "3,3"},
                    name="sp", out_names=["sp_a", "sp_b"])
    add = g.emit("Add", [s1, g.weight("bias", g.randn(3, 1))], [(2, 3, 3)], name="add")
    sub = g.emit("Sub", [add, s2], [(2, 3, 3)], name="sub")
    dv = g.emit("Div", [sub, g.weight("den", np.array([2.0], np.float32))],
                [(2, 3, 3)], name="dv")
    pw = g.emit("Pow", [g.emit("Add", [dv, g.weight("two", np.array([2.5], np.float32))],
                               [(2, 3, 3)], name="sh"),
                        g.weight("exp", np.array([2.0], np.float32))],
                [(2, 3, 3)], name="pw")
    gt = g.emit("Greater", [pw, g.weight("thr", np.array([4.0], np.float32))],
                [(2, 3, 3)], name="gt")
    wh = g.emit("Where", [gt, pw, dv], [(2, 3, 3)], name="wh")
    rm = g.emit("ReduceMean", [wh], [(2, 1, 3)], {"axes": "1", "keepdims": "1"},
                name="rm")
    gth = g.emit("Gather", [wh, g.weight("idx", np.array([0, 2], np.int64))],
                 [(2, 2, 3)], {"axis": 1}, name="gth")
    un = g.emit("Unsqueeze", [gth], [(2, 2, 1, 3)], {"axes": "2"}, name="un")
    sq = g.emit("Squeeze", [un], [(2, 2, 3)], {"axes": "2"}, name="sq")
    fl = g.emit("Flatten", [sq], [(2, 6)], {"axis": "1"}, name="fl")
    idn = g.emit("Identity", [rm], [(2, 1, 3)], name="idn")

    text = g.to_text()
    rng = np.random.RandomState(3)
    inputs = {"x": rng.randn(2, 3, 8).astype(np.float32)}
    outs = [fl.name, idn.name]
    py = _run_py(text, g.weights, inputs, outs)
    js = _run_js(text, g.weights, inputs, outs)
    _assert_match(py, js)


def test_engine_executes_real_interp_js_full_op_switch():
    """Completes exec coverage of interp.js's ENTIRE op dispatch: Equal,
    Less, ScatterND and the whole UNARY table (Sigmoid/Sqrt/Erf/Cos/Sin/
    Neg/Relu/Exp/Tanh) — with the convnet and tensor-op graphs above, every
    `case` in the JS switch now executes in CI."""
    g = GraphBuilder(seed=4)
    x = g.input("x", (2, 4))
    eq = g.emit("Equal", [x, g.weight("zero", np.zeros((1,), np.float32))],
                [(2, 4)], name="eq")
    ls = g.emit("Less", [x, g.weight("half", np.array([0.5], np.float32))],
                [(2, 4)], name="ls")
    wh = g.emit("Where", [ls, x, g.weight("neg1", np.array([-1.0], np.float32))],
                [(2, 4)], name="wh")
    sc = g.emit("ScatterND", [wh, g.weight("sidx", np.array([[0], [1]], np.int64)),
                              g.emit("Mul", [wh, wh], [(2, 4)], name="sq")],
                [(2, 4)], name="sc")
    cur = sc
    for i, un in enumerate(["Sqrt", "Erf", "Cos", "Sin", "Neg", "Relu",
                            "Exp", "Tanh", "Sigmoid"]):
        # keep magnitudes tame so Exp/Sqrt stay finite: Sigmoid/Tanh/Cos/Sin
        # naturally bound, Sqrt sees |x|<=1 post-Sigmoid etc.
        cur = g.emit(un, [cur], [(2, 4)], name=f"u{i}_{un.lower()}")
    # the Equal path surfaces through a Where (bool tensors aren't a
    # comparable output: XLA keeps bool, the in-tab interpreter stores f32)
    eqf = g.emit("Where", [eq, g.weight("nine", np.array([9.0], np.float32)), x],
                 [(2, 4)], name="eqf")

    text = g.to_text()
    rng = np.random.RandomState(8)
    inputs = {"x": (rng.rand(2, 4) * 0.8).astype(np.float32)}
    inputs["x"][0, 0] = 0.0  # exercise the Equal-true branch
    outs = [cur.name, eqf.name]
    py = _run_py(text, g.weights, inputs, outs)
    js = _run_js(text, g.weights, inputs, outs)
    _assert_match(py, js, tol=5e-4)  # Erf is the A&S 7.1.26 approximation


def test_engine_error_paths_match_api():
    """The JS surface's declared errors actually throw through minijs."""
    from onnxstream_tpu.minijs import JSThrow

    eng = Engine()
    eng.run_file(INTERP_JS)
    model = eng.await_(eng.call_method(eng.global_get("InterpModel"), "create"))
    with pytest.raises(JSThrow, match="no tensor named"):
        eng.await_(eng.call_method(model, "get_tensor", "nope"))
