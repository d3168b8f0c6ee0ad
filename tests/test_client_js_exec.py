"""Execute the REAL api/client.js against a live serve_main server.

client.js is the browser/node HTTP client mirroring the reference's WASM
Model glue (reference src/wasm.js); until now its only CI gate was textual
API lockstep with interp.js. Here the genuine client.js runs under the
embedded minijs engine with a urllib-backed fetch() shim, so the WHOLE
stack is driven end-to-end in one test:

    client.js (real JS, minijs-hosted)
      -> HTTP (urllib fetch shim)
        -> cli/serve_main.py (in-thread ThreadingHTTPServer)
          -> runtime Session (CPU backend)

and the tensors that come back through client.js's binary get_tensor parse
(u32 header + dims + f32 payload via typed-array buffer views) are compared
against a direct Session run."""

import threading
import urllib.request

import numpy as np
import pytest

from onnxstream_tpu.minijs import Engine
from onnxstream_tpu.minijs.runtime import JSArrayBuffer
from onnxstream_tpu.minijs.values import (
    NULL, UNDEF, JSObject, JSPromise, JSTypedArray, NativeFunction,
)

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


def _mk_fetch(eng: Engine) -> NativeFunction:
    """fetch() backed by urllib; returns an already-settled JSPromise of a
    Response-like object (json/text/arrayBuffer/headers.get)."""

    def _fetch(this, args):
        url = eng.from_js(args[0])
        opts = args[1] if len(args) > 1 and isinstance(args[1], JSObject) else None
        method = "GET"
        body = None
        if opts is not None:
            m = opts.props.get("method", UNDEF)
            if m is not UNDEF:
                method = eng.from_js(m)
            b = opts.props.get("body", UNDEF)
            if b is not UNDEF and b is not NULL:
                if isinstance(b, JSTypedArray):
                    body = b.arr.tobytes()
                elif isinstance(b, JSArrayBuffer):
                    body = b.data.tobytes()
                else:
                    body = str(eng.from_js(b)).encode()
        req = urllib.request.Request(url, data=body, method=method)
        try:
            with urllib.request.urlopen(req) as resp:
                payload = resp.read()
                ctype = resp.headers.get("Content-Type", "") or ""
        except urllib.error.HTTPError as e:
            # browser fetch() resolves on 4xx/5xx; only network errors reject
            payload = e.read()
            ctype = e.headers.get("Content-Type", "") or ""

        headers = JSObject({"get": NativeFunction(
            "get", lambda t, a: ctype if eng.from_js(a[0]).lower() == "content-type"
            else NULL)})
        response = JSObject({
            "headers": headers,
            "json": NativeFunction("json", lambda t, a: JSPromise(
                value=eng.to_js(__import__("json").loads(payload.decode())))),
            "text": NativeFunction("text", lambda t, a: JSPromise(
                value=payload.decode())),
            "arrayBuffer": NativeFunction("arrayBuffer", lambda t, a: JSPromise(
                value=JSArrayBuffer(np.frombuffer(payload, np.uint8).copy()))),
        })
        return JSPromise(value=response)

    return NativeFunction("fetch", _fetch)


def test_client_js_full_flow_over_http(server_url):
    import urllib.parse

    eng = Engine()
    eng.scope.declare("fetch", _mk_fetch(eng))
    eng.scope.declare("encodeURIComponent", NativeFunction(
        "encodeURIComponent",
        lambda t, a: urllib.parse.quote(str(eng.from_js(a[0])), safe="")))
    repo_js = __file__.replace("tests/test_client_js_exec.py",
                               "onnxstream_tpu/api/client.js")
    eng.run_file(repo_js)
    Model = eng.get(eng.get(eng.scope.lookup("module"), "exports"), "Model")

    model = eng.await_(eng.call_method(Model, "create", server_url, "dict"))
    w = np.arange(6, dtype=np.float32).reshape(2, 3)
    b = np.array([1, 2, 3], np.float32)
    eng.await_(eng.call_method(model, "add_weights_file", "float32", "w.bin", w.ravel()))
    eng.await_(eng.call_method(model, "add_weights_file", "float32", "b.bin", b))
    eng.await_(eng.call_method(model, "read_string", MODEL))
    x = np.linspace(-1, 1, 6, dtype=np.float32).reshape(2, 3)
    eng.await_(eng.call_method(model, "add_tensor", "x", [2.0, 3.0], x.ravel()))
    eng.await_(eng.call_method(model, "run"))
    t = eng.await_(eng.call_method(model, "get_tensor", "z"))
    shape = [int(d) for d in eng.from_js(eng.get(t, "shape"))]
    data = np.asarray(eng.from_js(eng.get(t, "data")), np.float32).reshape(shape)

    expect = x * w + b
    assert shape == [2, 3]
    assert np.abs(data - expect).max() < 1e-6

    names = eng.from_js(eng.await_(eng.call_method(model, "get_all_tensor_names")))
    assert "z" in names
    eng.await_(eng.call_method(model, "delete"))


def test_client_js_error_surface(server_url):
    from onnxstream_tpu.minijs import JSThrow

    eng = Engine()
    eng.scope.declare("fetch", _mk_fetch(eng))
    import urllib.parse

    eng.scope.declare("encodeURIComponent", NativeFunction(
        "encodeURIComponent",
        lambda t, a: urllib.parse.quote(str(eng.from_js(a[0])), safe="")))
    repo_js = __file__.replace("tests/test_client_js_exec.py",
                               "onnxstream_tpu/api/client.js")
    eng.run_file(repo_js)
    Model = eng.get(eng.get(eng.scope.lookup("module"), "exports"), "Model")
    model = eng.await_(eng.call_method(Model, "create", server_url, "dict"))
    # read_string of garbage must surface the server's {"error": ...} as a
    # thrown JS Error through client.js's _check
    with pytest.raises(JSThrow):
        eng.await_(eng.call_method(model, "read_string", "not a model"))
    eng.await_(eng.call_method(model, "delete"))
