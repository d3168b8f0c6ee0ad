"""Structural gates for the in-tab JavaScript interpreter (api/interp.js).

This environment has no external JavaScript engine (no node/deno/browser —
checked: nothing on PATH, no embeddable libjavascriptcore/v8/duktape); the
repo's own embedded engine (onnxstream_tpu/minijs) now EXECUTES the JS in CI
(tests/test_interp_js_exec.py). These tests remain as the engine-independent
structural layer — same discipline as the C# bindings gate
(tests/test_bindings_cs.py): structural invariants that catch the realistic
regression classes —

  * an op used by the browser examples' model.txt disappearing from the
    interpreter's dispatch,
  * the Model API surface drifting from api/client.js (the two must stay
    swappable, that is the whole design),
  * unbalanced-delimiter syntax damage,
  * the offline demo page and the golden-parity harness losing the tensor
    contract (same pushed-arg names as YoloPipeline.detect).

Execution-level verification is one command away in any environment with a
browser: serve the repo + model dir statically, open
examples/yolo_browser/offline.html, and call
window.runParity(modelsUrl, goldenUrl) against tools/make_yolo_golden.py
output (reference discipline: print_max_dist, reference sd.cpp:860-876).
"""

import os
import re

import pytest

from conftest import YOLO_DIR, has_yolo

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
INTERP = os.path.join(ROOT, "onnxstream_tpu", "api", "interp.js")
CLIENT = os.path.join(ROOT, "onnxstream_tpu", "api", "client.js")
OFFLINE = os.path.join(ROOT, "examples", "yolo_browser", "offline.html")


def _strip_js(src: str) -> str:
    """Remove comments and string/template literals (keeps structure)."""
    out, i, n = [], 0, len(src)
    while i < n:
        c = src[i]
        if c == "/" and i + 1 < n and src[i + 1] == "/":
            j = src.find("\n", i)
            i = n if j == -1 else j
        elif c == "/" and i + 1 < n and src[i + 1] == "*":
            j = src.find("*/", i + 2)
            i = n if j == -1 else j + 2
        elif c in "'\"`":
            q, j = c, i + 1
            while j < n and src[j] != q:
                j += 2 if src[j] == "\\" else 1
            i = j + 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _interp_ops():
    src = open(INTERP).read()
    ops = set(re.findall(r'case "(\w+)":', src))
    unary_block = re.search(r"const UNARY = \{(.*?)\n\};", src, re.S).group(1)
    ops |= set(re.findall(r"(\w+):", unary_block))
    return ops


def test_js_delimiters_balanced():
    for path in (INTERP,):
        body = _strip_js(open(path).read())
        for o, c in ("{}", "()", "[]"):
            assert body.count(o) == body.count(c), f"{path}: unbalanced {o}{c}"


def test_api_surface_matches_client_js():
    """InterpModel must stay a drop-in for client.js's Model."""
    def methods(path):
        body = open(path).read()
        return set(re.findall(r"^\s+(?:static\s+)?async (\w+)\(", body, re.M))

    client, interp = methods(CLIENT), methods(INTERP)
    # the full reference-WASM-glue surface must be present in-tab
    missing = client - interp - {"_check"}
    assert not missing, f"interp.js missing client.js methods: {missing}"


def test_interp_covers_injected_ops():
    ops = _interp_ops()
    from onnxstream_tpu.models.yolo.pipeline import YOLO_PRE_OPS, YOLO_POST_OPS
    injected = set(re.findall(r":(\w+)\*input", YOLO_PRE_OPS + YOLO_POST_OPS))
    assert injected <= ops, f"missing injected ops: {injected - ops}"


@pytest.mark.skipif(not has_yolo(), reason="reference yolov8n model not present")
def test_interp_covers_real_model_ops():
    ops = _interp_ops()
    used = set()
    for line in open(YOLO_DIR + "model.txt"):
        line = line.strip()
        if line:
            used.add(line.split("*", 1)[0].rsplit(":", 1)[1])
    assert used <= ops, f"yolov8n needs ops missing from interp.js: {used - ops}"


def test_offline_page_contract():
    page = open(OFFLINE).read()
    assert "onnxstream_tpu/api/interp.js" in page
    assert "InterpModel.create" in page
    # no server-side execution anywhere in the page
    assert "client.js" not in page and "Model.create(base" not in page
    # same pushed-argument tensor contract as YoloPipeline.detect
    for arg in ("images_raw", "slice_start", "slice_end", "slice_axis",
                "div_value", "split_arg"):
        assert f'"{arg}"' in page, f"offline.html must push {arg}"
    assert "runParity" in page


def test_grammar_agrees_with_python_parser():
    """The JS parser's split rules must mirror ir.py on every real line: the
    Python parse is the oracle; assert the structural splits the JS relies on
    (field count, name:type split, ';' tensor lists) hold for all lines."""
    if not has_yolo():
        pytest.skip("reference yolov8n model not present")
    from onnxstream_tpu.ir import parse_op_line
    for no, line in enumerate(open(YOLO_DIR + "model.txt"), 1):
        line = line.strip()
        if not line:
            continue
        node = parse_op_line(line, no, allow_dynamic=True)
        fields = line.split("*")
        assert len(fields) in (3, 4)
        # the JS lastIndexOf(':') name/type split equals ir.py's rfind
        assert fields[0].rsplit(":", 1)[1] == node.op_type
        assert len(fields[1][6:].split(";")) == len(node.inputs)
        assert len(fields[2][7:].split(";")) == len(node.outputs)


def test_interp_covers_whisper_graph_ops():
    """The in-tab interpreter must execute the whisper encoder/decoder graphs
    (the reference's Whisper WASM example runs in-tab, reference
    examples/Whisper_wasm/index.html; tools/export_whisper_intab.py ships the
    same graphs to examples/whisper_browser)."""
    ops = _interp_ops()
    from onnxstream_tpu.models.whisper.model import (
        WHISPER_TINY_TEST, build_decoder, build_encoder)
    used = set()
    for g in (build_encoder(WHISPER_TINY_TEST).graph(),
              build_decoder(WHISPER_TINY_TEST, new_len=4).graph()):
        used |= {op.op_type for op in g.ops}
    assert used <= ops, f"whisper needs ops missing from interp.js: {used - ops}"
