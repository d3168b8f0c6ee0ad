"""Execute the YOLO offline page's REAL JavaScript under minijs.

examples/yolo_browser/offline.html is the counterpart of the reference's
YOLOv8n WASM browser demo (reference examples/YOLOv8n_wasm/index.html) —
camera/canvas I/O plus an in-tab interp.js run and the original TF.js-style
hard NMS. Here the page's inline script loads top-to-bottom with DOM stubs,
its nms()/iou() run on adversarial boxes against the Python
non_max_suppression (declared bit-identical semantics), and runFrame()
drives a miniature injected-preproc graph through the page's own code path
(add_tensor int64 args, split_arg, named outputs)."""

import os
import re

import numpy as np

from onnxstream_tpu.minijs import Engine
from onnxstream_tpu.minijs.values import JSObject, NativeFunction

PAGE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "examples", "yolo_browser", "offline.html")


def _load_page() -> Engine:
    eng = Engine()
    elements = {}

    def _get_el(this, args):
        key = eng.from_js(args[0])
        if key not in elements:
            elements[key] = JSObject({"textContent": "", "value": "",
                                      "width": 640.0, "height": 640.0})
        return elements[key]

    doc = JSObject({
        "getElementById": NativeFunction("getElementById", _get_el),
        "createElement": NativeFunction("createElement",
                                        lambda t, a: JSObject({"width": 0.0,
                                                               "height": 0.0})),
    })
    eng.scope.declare("document", doc)
    eng.scope.declare("window", eng.scope.lookup("globalThis"))
    repo = os.path.dirname(os.path.dirname(os.path.dirname(PAGE)))
    eng.run_file(os.path.join(repo, "onnxstream_tpu", "api", "interp.js"))
    m = re.search(r"<script>(.*)</script>", open(PAGE, encoding="utf-8").read(), re.S)
    eng.run(m.group(1))
    return eng


def test_yolo_page_loads_and_exports():
    eng = _load_page()
    gt = eng.scope.lookup("globalThis")
    assert "runParity" in gt.props
    for fn in ("nms", "iou", "buildModel", "runFrame"):
        assert eng.scope.lookup(fn) is not None


def test_yolo_page_nms_matches_python():
    from onnxstream_tpu.models.yolo import non_max_suppression

    eng = _load_page()
    js_nms = eng.scope.lookup("nms")
    rng = np.random.RandomState(5)
    for trial in range(4):
        n = 40
        # clustered boxes so suppression actually triggers, plus degenerate
        # zero-area boxes (iou() must return 0 for those)
        centers = rng.rand(n, 2) * 4
        wh = rng.rand(n, 2) * 2
        if trial == 3:
            wh[::7] = 0.0
        boxes = np.stack([centers[:, 0], centers[:, 1],
                          centers[:, 0] + wh[:, 0], centers[:, 1] + wh[:, 1]],
                         axis=1).astype(np.float32)
        scores = rng.rand(n).astype(np.float32)
        py = non_max_suppression(boxes, scores, 10, 0.45, 0.25)
        out = eng.interp.call(js_nms, None, [
            eng.to_js(boxes.reshape(-1)), eng.to_js(scores),
            10.0, 0.45, 0.25])
        js = [int(v) for v in eng.from_js(out)]
        assert js == list(py), f"trial {trial}: js={js} py={py}"


def test_yolo_page_runframe_through_injected_graph():
    """Drive the page's exact injected-op contract (PRE_OPS + core + POST_OPS
    with dynamic shapes, the same strings YoloPipeline uses) through the
    in-tab interpreter under minijs, vs the Python Session oracle."""
    from onnxstream_tpu.convert.builder import GraphBuilder
    from onnxstream_tpu.models.yolo.pipeline import YOLO_PRE_OPS, YOLO_POST_OPS
    from onnxstream_tpu.runtime.config import SessionConfig
    from onnxstream_tpu.runtime.session import Session
    from onnxstream_tpu.runtime.weights import DictWeightsProvider

    H = 4  # the page hardcodes 640; the contract is size-agnostic
    g = GraphBuilder(seed=2)
    x = g.input("images", (1, 3, H, H))
    w = g.weight("head_w", g.randn(6, 3, 1, 1))
    b = g.weight("head_b", g.randn(6))
    g.emit("Conv", [x, w, b], [(1, 6, H, H)], name="head", out_names=["conv_raw"])
    g.emit("Reshape", [g.graph().ops[-1].outputs[0],
                       g.weight("oshape", np.array([1, 6, H * H], np.int64))],
           [(1, 6, H * H)], name="rs", out_names=["output0"])
    text = YOLO_PRE_OPS + g.to_text() + "\n" + YOLO_POST_OPS

    pushes = [
        ("images_raw", [1.0, float(H), float(H), 4.0], None, "float32"),
        ("slice_start", [1.0], np.array([0], np.int64), "int64"),
        ("slice_end", [1.0], np.array([3], np.int64), "int64"),
        ("slice_axis", [1.0], np.array([3], np.int64), "int64"),
        ("div_value", [1.0], np.array([255.0], np.float32), "float32"),
        ("split_arg", [2.0], np.array([4, 2], np.int64), "int64"),
    ]
    rng = np.random.RandomState(9)
    rgba = (rng.rand(1 * H * H * 4) * 255).astype(np.float32)

    eng = _load_page()
    model = eng.await_(eng.call_method(eng.global_get("InterpModel"), "create"))
    eng.await_(eng.call_method(model, "set_option", "support_dynamic_shapes", True))
    eng.await_(eng.call_method(model, "read_string", text))
    manifest = eng.from_js(eng.await_(eng.call_method(model, "get_weights_names")))
    for part in (manifest.split("|") if manifest else []):
        typ, name = part.split(":", 1)
        eng.await_(eng.call_method(
            model, "add_weights_file", typ, name,
            np.ascontiguousarray(g.weights[name],
                                 np.int64 if typ == "int64" else np.float32)))
    for name, shape, data, typ in pushes:
        arr = rgba if data is None else data
        eng.await_(eng.call_method(model, "add_tensor", name, shape, arr,
                                   typ if typ == "int64" else None))
    eng.await_(eng.call_method(model, "run"))
    a0 = np.asarray(eng.from_js(eng.get(eng.await_(
        eng.call_method(model, "get_tensor", "output0_0")), "data")), np.float32)
    a1 = np.asarray(eng.from_js(eng.get(eng.await_(
        eng.call_method(model, "get_tensor", "output0_1")), "data")), np.float32)

    s = Session(config=SessionConfig(compute_dtype="float32"),
                weights_provider=DictWeightsProvider(dict(g.weights)))
    s.read_string(text)
    s.add_tensor("images_raw", rgba.reshape(1, H, H, 4))
    for name, shape, data, typ in pushes[1:]:
        s.add_tensor(name, data)
    res = s.run()
    s.close()
    assert np.abs(a0 - np.asarray(res["output0_0"]).ravel()).max() < 2e-4
    assert np.abs(a1 - np.asarray(res["output0_1"]).ravel()).max() < 2e-4
