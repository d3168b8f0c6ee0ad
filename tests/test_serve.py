"""HTTP model server: full client flow over the wire (the TPU-native
counterpart of the reference WASM browser protocol)."""

import json
import struct
import threading
import urllib.request

import numpy as np
import pytest

MODEL = (
    "m:Mul*input:x(2,3);w.bin(float32:2,3)*output:y(2,3)\n"
    "a:Add*input:y(2,3);b.bin(float32:3)*output:z(2,3)\n"
)


@pytest.fixture(scope="module")
def server_url():
    from onnxstream_tpu.cli.serve_main import serve

    srv = serve("127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _req(method, url, body=None):
    r = urllib.request.Request(url, data=body, method=method)
    with urllib.request.urlopen(r) as resp:
        return resp.read(), resp.headers.get("Content-Type", "")


def test_http_model_flow(server_url):
    body, _ = _req("POST", f"{server_url}/models?wp=dict")
    h = json.loads(body)["handle"]

    w = np.arange(6, dtype=np.float32)
    b = np.array([1, 2, 3], np.float32)
    _req("PUT", f"{server_url}/models/{h}/weights/w.bin?type=float32", w.tobytes())
    _req("PUT", f"{server_url}/models/{h}/weights/b.bin?type=float32", b.tobytes())
    _req("POST", f"{server_url}/models/{h}/read_string", MODEL.encode())

    names, _ = _req("GET", f"{server_url}/models/{h}/weights_names")
    assert names.decode() == "float32:w.bin|float32:b.bin"

    x = np.full((2, 3), 2.0, np.float32)
    _req("PUT", f"{server_url}/models/{h}/tensors/x?type=float32&dims=2,3", x.tobytes())
    body, _ = _req("POST", f"{server_url}/models/{h}/run")
    assert json.loads(body) == {}

    body, ctype = _req("GET", f"{server_url}/models/{h}/tensors/z")
    assert "octet-stream" in ctype
    ndims = struct.unpack_from("<I", body)[0]
    dims = struct.unpack_from(f"<{ndims}I", body, 4)
    data = np.frombuffer(body, np.float32, offset=4 + 4 * ndims).reshape(dims)
    np.testing.assert_allclose(data, x * w.reshape(2, 3) + b, rtol=1e-6)

    names, _ = _req("GET", f"{server_url}/models/{h}/tensor_names")
    assert "z" in names.decode().split("|")

    _req("POST", f"{server_url}/models/{h}/clear_tensors")
    _req("DELETE", f"{server_url}/models/{h}")


def test_http_run_error(server_url):
    body, _ = _req("POST", f"{server_url}/models?wp=dict")
    h = json.loads(body)["handle"]
    _req("POST", f"{server_url}/models/{h}/read_string", MODEL.encode())
    # no input pushed -> run_2 reports the error as a string
    body, _ = _req("POST", f"{server_url}/models/{h}/run")
    assert "error" in json.loads(body)
    _req("DELETE", f"{server_url}/models/{h}")


def test_http_option_roundtrip(server_url):
    body, _ = _req("POST", f"{server_url}/models?wp=dict")
    h = json.loads(body)["handle"]
    _req("POST", f"{server_url}/models/{h}/options?name=use_fp16_arithmetic&value=1")
    with pytest.raises(urllib.error.HTTPError):
        _req("POST", f"{server_url}/models/{h}/options?name=bogus&value=1")
    _req("DELETE", f"{server_url}/models/{h}")


def test_whisper_http_example(server_url):
    """The whisper-over-HTTP example must produce the same tokens as the
    in-process pipeline (same synthetic seeds)."""
    import subprocess
    import sys as _sys
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [_sys.executable, os.path.join(repo, "examples/whisper_http/run.py"),
         "--server", server_url, "--synthetic", "--max-tokens", "4"],
        capture_output=True, text=True, timeout=600,
        env=dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo),
    )
    assert r.returncode == 0, r.stderr
    assert r.stdout.startswith("tokens: ["), r.stdout

    import numpy as np

    from onnxstream_tpu.models.whisper import WhisperPipeline

    audio = np.random.RandomState(0).randn(16000).astype(np.float32) * 0.1
    expect = WhisperPipeline.from_synthetic().transcribe(audio, max_tokens=4)
    assert r.stdout.strip() == f"tokens: {expect}"


def test_http_read_file_gated_and_no_wildcard_cors(server_url):
    body, _ = _req("POST", f"{server_url}/models?wp=dict")
    h = json.loads(body)["handle"]
    # read_file (arbitrary server-side path) is disabled unless opted in
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req("POST", f"{server_url}/models/{h}/read_file", b"/etc/hostname")
    assert ei.value.code == 403
    # no CORS wildcard: default responses carry no Access-Control-Allow-Origin
    r = urllib.request.Request(f"{server_url}/models/{h}/tensor_names")
    with urllib.request.urlopen(r) as resp:
        assert resp.headers.get("Access-Control-Allow-Origin") is None
    _req("DELETE", f"{server_url}/models/{h}")


def test_http_read_file_and_cors_opt_in(tmp_path):
    import threading as _threading

    from onnxstream_tpu.cli.serve_main import serve

    srv = serve("127.0.0.1", 0, allow_origin="http://localhost:3000",
                allow_read_file=True)
    t = _threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        mp = tmp_path / "model.txt"
        mp.write_text(MODEL)
        import numpy as np_

        (tmp_path / "w.bin").write_bytes(np_.arange(6, dtype=np_.float32).tobytes())
        (tmp_path / "b.bin").write_bytes(np_.array([1, 2, 3], np_.float32).tobytes())
        body, _ = _req("POST", f"{url}/models?wp=ram")
        h = json.loads(body)["handle"]
        body, _ = _req("POST", f"{url}/models/{h}/read_file", str(mp).encode())
        assert json.loads(body) == {}
        r = urllib.request.Request(f"{url}/models/{h}/tensor_names")
        with urllib.request.urlopen(r) as resp:
            assert resp.headers.get("Access-Control-Allow-Origin") == "http://localhost:3000"
        _req("DELETE", f"{url}/models/{h}")
    finally:
        srv.shutdown()


from conftest import YOLO_DIR, has_yolo


@pytest.mark.skipif(not has_yolo(), reason="reference yolov8n model not present")
def test_http_yolo_browser_demo_flow(server_url):
    """Replays examples/yolo_browser/index.html verbatim over the wire — the
    in-tab story for PARITY #31: same pre/post text-op injection around the
    real model.txt, manifest-driven weight upload, pushed Slice/Div/Split
    arguments, RGBA frame in, and client-side NMS on the two split outputs
    (reference examples/YOLOv8n_wasm/index.html:413-421, 559-573)."""
    import os

    from onnxstream_tpu.models.yolo import non_max_suppression

    PRE_OPS = (
        "pre_0:Slice*input:images_raw();slice_start();slice_end();slice_axis()*output:slice_output()\n"
        "pre_1:Transpose*input:slice_output()*output:trans_output()*perm:0,3,1,2\n"
        "pre_2:Div*input:trans_output();div_value()*output:images()\n"
    )
    POST_OPS = (
        "post_0:Transpose*input:output0()*output:trans2_output()*perm:0,2,1\n"
        "post_1:Split*input:trans2_output();split_arg()*output:output0_0();output0_1()*axis:2"
    )

    body, _ = _req("POST", f"{server_url}/models?wp=dict")
    h = json.loads(body)["handle"]
    _req("POST", f"{server_url}/models/{h}/options?name=support_dynamic_shapes&value=1")

    model_txt = open(os.path.join(YOLO_DIR, "model.txt")).read()
    _req("POST", f"{server_url}/models/{h}/read_string",
         (PRE_OPS + model_txt + "\n" + POST_OPS).encode())

    names, _ = _req("GET", f"{server_url}/models/{h}/weights_names")
    entries = names.decode().split("|")
    assert len(entries) > 100
    for e in entries:
        typ, name = e.split(":", 1)
        with open(os.path.join(YOLO_DIR, name), "rb") as f:
            _req("PUT", f"{server_url}/models/{h}/weights/{name}?type={typ}", f.read())

    # synthetic RGBA frame, same shape the canvas produces
    rng = np.random.RandomState(0)
    rgba = rng.randint(0, 256, (1, 640, 640, 4)).astype(np.float32)

    def put(name, dims, arr, typ="float32"):
        dimstr = ",".join(str(d) for d in dims)
        _req("PUT", f"{server_url}/models/{h}/tensors/{name}?type={typ}&dims={dimstr}",
             np.asarray(arr).tobytes())

    put("images_raw", (1, 640, 640, 4), rgba)
    put("slice_start", (1,), np.array([0], np.int64), "int64")
    put("slice_end", (1,), np.array([3], np.int64), "int64")
    put("slice_axis", (1,), np.array([3], np.int64), "int64")
    put("div_value", (1,), np.array([255.0], np.float32))
    put("split_arg", (2,), np.array([4, 80], np.int64), "int64")
    body, _ = _req("POST", f"{server_url}/models/{h}/run")
    assert json.loads(body) == {}

    def get(name):
        body, _ = _req("GET", f"{server_url}/models/{h}/tensors/{name}")
        ndims = struct.unpack_from("<I", body)[0]
        dims = struct.unpack_from(f"<{ndims}I", body, 4)
        return np.frombuffer(body, np.float32, offset=4 + 4 * ndims).reshape(dims)

    b = get("output0_0")  # (1, 8400, 4) xywh
    s = get("output0_1")  # (1, 8400, 80)
    assert b.shape == (1, 8400, 4) and s.shape == (1, 8400, 80)
    xywh, cls = b[0], s[0]
    boxes = np.stack([
        xywh[:, 1] - xywh[:, 3] / 2, xywh[:, 0] - xywh[:, 2] / 2,
        xywh[:, 1] + xywh[:, 3] / 2, xywh[:, 0] + xywh[:, 2] / 2,
    ], axis=1)
    scores = cls.max(axis=1)
    assert np.isfinite(boxes).all() and 0 <= scores.max() <= 1
    non_max_suppression(boxes, scores, iou_threshold=0.45, score_threshold=0.25)
    _req("DELETE", f"{server_url}/models/{h}")
