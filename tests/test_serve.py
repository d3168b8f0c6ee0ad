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
