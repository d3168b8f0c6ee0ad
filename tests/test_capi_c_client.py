"""Compile and run a REAL C client of the 15-function C ABI (VERDICT r4 #6).

tests/test_api.py already drives libonnxstream_tpu.so via ctypes; this test
closes the remaining gap — the ABI declarations being consumed by an actual C
compiler + linker, the reference's real client scenario
(src/exports.cpp:42-311 is consumed from C/C#). The C source
(tests/data/capi_smoke.c) exercises every exported function including the
client-allocates-and-fills staging flow, the ReturnLayout struct, the extra
-output path, both error-string variants, and model_free_buffer.

The client's embedded CPython needs the repo plus the venv's site-packages on
PYTHONPATH (numpy/jax live in /opt/venv, the embedded interpreter starts from
the base prefix); /root/.axon_site is deliberately NOT included so the axon
TPU plugin never registers and JAX_PLATFORMS=cpu takes effect directly.
"""

import os
import subprocess
import sys
import sysconfig

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CSRC = os.path.join(REPO, "csrc")
LIB = os.path.join(CSRC, "libonnxstream_tpu.so")
SRC = os.path.join(REPO, "tests", "data", "capi_smoke.c")


@pytest.mark.skipif(not os.path.exists(LIB), reason="libonnxstream_tpu.so not built")
def test_c_client_compiles_links_and_runs(tmp_path):
    exe = str(tmp_path / "capi_smoke")
    # gcc, not g++: the smoke client is plain C, proving the ABI needs no C++
    cc = subprocess.run(
        ["gcc", "-O1", "-Wall", "-Werror", "-pthread", SRC, "-o", exe,
         f"-L{CSRC}", "-lonnxstream_tpu", f"-Wl,-rpath,{CSRC}"],
        capture_output=True, text=True, timeout=120,
    )
    assert cc.returncode == 0, f"compile failed:\n{cc.stderr}"

    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO, sysconfig.get_paths()["purelib"]])
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONHOME", None)
    r = subprocess.run([exe], capture_output=True, text=True, timeout=300, env=env)
    assert r.returncode == 0, f"rc={r.returncode}\nstdout={r.stdout}\nstderr={r.stderr[-2000:]}"
    assert "CAPI_C_SMOKE_OK" in r.stdout, r.stdout
