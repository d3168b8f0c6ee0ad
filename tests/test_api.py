"""C ABI / bindings tests: in-process PyModel always; ctypes Model over the
compiled libonnxstream_tpu.so when present; native prefetcher when built."""

import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(REPO, "csrc", "libonnxstream_tpu.so")
NATIVE = os.path.join(REPO, "csrc", "libostpu_native.so")

MODEL = (
    "m:Mul*input:x(2,3);w.bin(float32:2,3)*output:y(2,3)\n"
    "a:Add*input:y(2,3);b.bin(float32:3)*output:z(2,3)\n"
)


def _weights():
    return {
        "w.bin": np.arange(6, dtype=np.float32).reshape(2, 3),
        "b.bin": np.array([1, 2, 3], np.float32),
    }


def _drive(model):
    for name, arr in _weights().items():
        model.add_weights_file("float32", name, arr)
    model.read_string(MODEL)
    names = model.get_weights_names()
    assert names == ["float32:w.bin", "float32:b.bin"]
    x = np.ones((2, 3), np.float32) * 2
    model.add_tensor("x", x)
    model.run()
    out, dims = model.get_tensor("z")
    ref = x * _weights()["w.bin"] + _weights()["b.bin"]
    np.testing.assert_allclose(out, ref, rtol=1e-6)
    assert dims == [2, 3]
    assert "z" in model.get_all_tensor_names()
    model.clear_tensors()


def test_pymodel_e2e():
    from onnxstream_tpu.api.bindings import PyModel

    with PyModel(weights_provider_name="dict") as m:
        m.set_use_fp16_arithmetic(False)
        _drive(m)


def test_pymodel_error_string():
    from onnxstream_tpu.api.bindings import OnnxStreamError, PyModel

    with PyModel() as m:
        with pytest.raises(OnnxStreamError):
            m.read_file("/nonexistent/model.txt")


def test_pymodel_list_io():
    from onnxstream_tpu.api.bindings import PyModel

    with PyModel() as m:
        for name, arr in _weights().items():
            m.add_weights_file("float32", name, arr)
        m.read_string(MODEL)
        m.add_tensor_as_list("x", [[1, 1, 1], [1, 1, 1]], "float32")
        m.run()
        vals, dims = m.get_tensor_as_list("z")
        assert dims == [2, 3] and len(vals) == 6


def test_set_option_unknown():
    from onnxstream_tpu.api.bindings import PyModel

    with PyModel() as m:
        with pytest.raises(ValueError):
            m._set_option("bogus_option", True)


@pytest.mark.skipif(not os.path.exists(LIB), reason="libonnxstream_tpu.so not built")
def test_ctypes_model_e2e():
    # run in a subprocess: embedding libpython into the running pytest python
    # is fragile; a fresh process is the real client scenario anyway
    code = f"""
import sys, numpy as np
sys.path.insert(0, {REPO!r})
import jax; jax.config.update("jax_platforms", "cpu")
from onnxstream_tpu.api.bindings import Model
m = Model({LIB!r}, weights_provider_name="dict")
m.add_weights_file("float32", "w.bin", np.arange(6, dtype=np.float32))
m.add_weights_file("float32", "b.bin", np.array([1, 2, 3], np.float32))
m.read_string({MODEL!r})
m.add_tensor("x", np.ones((2, 3), np.float32) * 2)
m.run()
out, dims = m.get_tensor("z")
ref = 2 * np.arange(6, dtype=np.float32).reshape(2, 3) + np.array([1, 2, 3], np.float32)
assert np.allclose(out, ref), (out, ref)
assert dims == [2, 3]
m.close()
print("CTYPES_OK")
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run(["python", "-c", code], capture_output=True, text=True, env=env, timeout=300)
    assert "CTYPES_OK" in r.stdout, r.stdout + r.stderr


@pytest.mark.skipif(not os.path.exists(LIB), reason="libonnxstream_tpu.so not built")
def test_ctypes_two_models_interleaved():
    """Two concurrent models through the .so: pending weights and tensors are
    keyed by model handle (reference keeps per-model provider state,
    src/exports.cpp:150-203). The second-created model runs FIRST — with
    globally-pooled staging it would receive the first model's weights."""
    code = f"""
import sys, numpy as np
sys.path.insert(0, {REPO!r})
import jax; jax.config.update("jax_platforms", "cpu")
from onnxstream_tpu.api.bindings import Model
MODEL = {MODEL!r}
m1 = Model({LIB!r}, weights_provider_name="dict")
m2 = Model({LIB!r}, weights_provider_name="dict")
w1 = np.arange(6, dtype=np.float32); b1 = np.array([1, 2, 3], np.float32)
w2 = np.arange(6, dtype=np.float32)[::-1].copy(); b2 = np.array([9, 8, 7], np.float32)
# interleave weight staging across the two models
m1.add_weights_file("float32", "w.bin", w1)
m2.add_weights_file("float32", "w.bin", w2)
m2.add_weights_file("float32", "b.bin", b2)
m1.add_weights_file("float32", "b.bin", b1)
m1.read_string(MODEL)
m2.read_string(MODEL)
x1 = np.ones((2, 3), np.float32) * 2
x2 = np.ones((2, 3), np.float32) * 3
m1.add_tensor("x", x1)
m2.add_tensor("x", x2)
m2.run()   # second model runs first
m1.run()
out1, _ = m1.get_tensor("z")
out2, _ = m2.get_tensor("z")
assert np.allclose(out1, x1 * w1.reshape(2, 3) + b1), out1
assert np.allclose(out2, x2 * w2.reshape(2, 3) + b2), out2
m1.close(); m2.close()
print("TWO_MODELS_OK")
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run(["python", "-c", code], capture_output=True, text=True, env=env, timeout=300)
    assert "TWO_MODELS_OK" in r.stdout, r.stdout + r.stderr


@pytest.mark.skipif(not os.path.exists(NATIVE), reason="libostpu_native.so not built")
def test_native_prefetcher(tmp_path):
    from onnxstream_tpu.dtypes import DType
    from onnxstream_tpu.runtime.weights import NativeDiskPrefetchWeightsProvider

    arrays = {f"w{i}.bin": np.random.RandomState(i).rand(64).astype(np.float32) for i in range(8)}
    for n, a in arrays.items():
        a.tofile(str(tmp_path / n))
    p = NativeDiskPrefetchWeightsProvider(str(tmp_path) + os.sep, max_bytes=256)
    entries = [(n, DType.float32, (64,)) for n in arrays]
    p.on_init(entries)
    for n, a in arrays.items():
        got = p.get(n, DType.float32, (64,))
        np.testing.assert_array_equal(got, a)
    # restart and read again (bounded budget forces the worker to wait)
    p.on_restart()
    got = p.get("w0.bin", DType.float32, (64,))
    np.testing.assert_array_equal(got, arrays["w0.bin"])
    # out-of-order fallback
    got = p.get("w5.bin", DType.float32, (64,))
    np.testing.assert_array_equal(got, arrays["w5.bin"])
    p.close()


@pytest.mark.skipif(not os.path.exists(NATIVE), reason="libostpu_native.so not built")
def test_native_prefetcher_missing_file(tmp_path):
    from onnxstream_tpu.dtypes import DType
    from onnxstream_tpu.runtime.weights import NativeDiskPrefetchWeightsProvider

    p = NativeDiskPrefetchWeightsProvider(str(tmp_path) + os.sep)
    with pytest.raises(IOError):
        p.get("missing.bin", DType.float32, (4,))
    p.close()


def test_capi_disk_provider_uses_model_dir(tmp_path):
    """Disk providers must resolve .bin files relative to the model.txt
    directory, not the process cwd (review finding: eager '' prefix)."""
    import numpy as np

    from onnxstream_tpu.api import capi

    w = np.arange(6, dtype=np.float32)
    w.tofile(str(tmp_path / "w.bin"))
    (tmp_path / "model.txt").write_text("m:Mul*input:x(2,3);w.bin(float32:2,3)*output:y(2,3)\n")
    h = capi.model_new_2(0, "::onnxstream::DiskNoCacheWeightsProvider")
    assert capi.model_read_file(h, str(tmp_path / "model.txt")) is None
    capi.model_add_tensor(h, "float32", "x", [2, 3], np.ones(6, np.float32))
    assert capi.model_run_2(h) is None
    dims, data = capi.model_get_tensor(h, "y")
    np.testing.assert_allclose(np.asarray(data).reshape(dims), w.reshape(2, 3))
    capi.model_delete(h)


def test_capi_get_tensor_rejects_int(tmp_path):
    import numpy as np
    import pytest as _pytest

    from onnxstream_tpu.api import capi

    h = capi.model_new_2(0, "dict")
    capi.model_read_string(h, "s:Shape*input:x(2,3)*output:y(2)\n")
    capi.model_add_tensor(h, "float32", "x", [2, 3], np.ones(6, np.float32))
    capi.model_run(h)
    with _pytest.raises(TypeError):
        capi.model_get_tensor(h, "y")  # int64 output: fp32-only surface
    capi.model_delete(h)
