"""Execute the whisper in-tab page's REAL mel-frontend JavaScript via minijs.

The browser page (examples/whisper_browser/index.html) ports
models/whisper/mel.py to JS so audio featurization runs in-tab — the same
role as the reference's JS mel frontend (reference
examples/Whisper_wasm/index.html:191-600). Until minijs existed this port
was only eyeball-verified; here the page's inline <script> is extracted,
loaded with DOM stubs, and its logMelSpectrogram() output is compared
against the Python mel on the same audio.

~20 s of tree-walked direct DFT -> slow tier (pytest -m slow).
"""

import os
import re

import numpy as np
import pytest

from onnxstream_tpu.minijs import Engine
from onnxstream_tpu.minijs.values import JSObject

PAGE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "examples", "whisper_browser", "index.html")


def _inline_script(html: str) -> str:
    m = re.search(r"<script>(.*)</script>", html, re.S)
    assert m, "no inline script block in the whisper page"
    return m.group(1)


def _engine_with_dom() -> Engine:
    eng = Engine()

    # DOM stubs: getElementById returns a per-id singleton the page can hang
    # textContent/onclick/value off; nothing else of the DOM is needed to
    # LOAD the script (fetch only runs inside user-triggered handlers).
    elements = {}

    def _get_el(this, args):
        key = eng.from_js(args[0])
        if key not in elements:
            elements[key] = JSObject({"textContent": "", "value": "",
                                      "files": eng.to_js([])})
        return elements[key]

    from onnxstream_tpu.minijs.values import NativeFunction

    eng.scope.declare("document", JSObject(
        {"getElementById": NativeFunction("getElementById", _get_el)}))
    eng.scope.declare("window", eng.scope.lookup("globalThis"))
    # the page loads interp.js via <script src> first
    repo = os.path.dirname(os.path.dirname(os.path.dirname(PAGE)))
    eng.run_file(os.path.join(repo, "onnxstream_tpu", "api", "interp.js"))
    return eng


@pytest.mark.slow
def test_whisper_page_mel_js_matches_python():
    from onnxstream_tpu.models.whisper.mel import log_mel_spectrogram

    eng = _engine_with_dom()
    eng.run(_inline_script(open(PAGE, encoding="utf-8").read()))

    rng = np.random.RandomState(11)
    audio = (0.4 * rng.randn(1040)).clip(-1, 1).astype(np.float32)  # 5 frames
    n_mels, pad_to = 80, 8

    js_fn = eng.scope.lookup("logMelSpectrogram")
    out = eng.interp.call(js_fn, None,
                          [eng.to_js(audio), float(n_mels), float(pad_to)])
    js_mel = np.asarray(eng.from_js(out), np.float32).reshape(n_mels, pad_to)

    py_mel = log_mel_spectrogram(audio, n_mels=n_mels, pad_to=pad_to)[0]
    assert js_mel.shape == py_mel.shape
    d = float(np.abs(js_mel - py_mel).max())
    assert d < 5e-4, f"mel mismatch: max|Δ|={d}"


@pytest.mark.slow
def test_whisper_page_script_loads_and_wires_dom():
    """The page's full inline script executes top-to-bottom under minijs
    (incl. the window.runParity export and the start-button wiring)."""
    eng = _engine_with_dom()
    eng.run(_inline_script(open(PAGE, encoding="utf-8").read()))
    gt = eng.scope.lookup("globalThis")
    assert "runParity" in gt.props, "window.runParity not exported"
    start = eng.interp.call(
        eng.get(eng.scope.lookup("document"), "getElementById"),
        None, ["start"])
    assert "onclick" in start.props, "start button handler not wired"
