"""Whisper over the HTTP model API — counterpart of the reference browser STT
example (reference examples/Whisper_wasm/index.html).

The reference drives the converted encoder/decoder through the WASM Model API
with explicit self/cross-KV tensors and an `offset` scalar; this example
drives the SAME tensor contract through the HTTP server (a TPU can't run in a
browser tab, so the model lives server-side and any client — this script, a
web page via api/client.js, curl — pushes the same tensors).

Run a server:   python -m onnxstream_tpu.cli.serve_main --port 8080
Then:           python examples/whisper_http/run.py --audio jfk.raw \
                    --encoder path/encoder_fp32/model.txt --decoder path/decoder_fp32/model.txt

Without converted models use --synthetic, which uploads the tiny
random-weight whisper graphs through the same API (proving the flow E2E).
"""

from __future__ import annotations

import argparse
import json
import struct
import sys
import urllib.request

import numpy as np

sys.path.insert(0, __file__.rsplit("/examples/", 1)[0])

from onnxstream_tpu.models.whisper.mel import log_mel_spectrogram, read_16bit_raw_audio
from onnxstream_tpu.models.whisper.model import (
    WHISPER_TINY_TEST,
    build_decoder,
    build_encoder,
    mangle,
)


class HttpModel:
    """Minimal python twin of api/client.js."""

    def __init__(self, base: str, wp: str = "dict"):
        self.base = base.rstrip("/")
        self.h = json.loads(self._req("POST", f"/models?wp={wp}"))["handle"]

    def _req(self, method, path, body=None):
        r = urllib.request.Request(self.base + path, data=body, method=method)
        with urllib.request.urlopen(r) as resp:
            return resp.read()

    def read_string(self, text):
        self._req("POST", f"/models/{self.h}/read_string", text.encode())

    def add_weights(self, dtype, name, arr):
        self._req("PUT", f"/models/{self.h}/weights/{name}?type={dtype}", np.ascontiguousarray(arr).tobytes())

    def add_tensor(self, name, arr):
        t = {"float32": "float32", "int64": "int64"}[str(arr.dtype)]
        dims = ",".join(str(d) for d in arr.shape)
        self._req("PUT", f"/models/{self.h}/tensors/{name}?type={t}&dims={dims}", arr.tobytes())

    def run(self):
        out = json.loads(self._req("POST", f"/models/{self.h}/run"))
        if out.get("error"):
            raise RuntimeError(out["error"])

    def get_tensor(self, name):
        body = self._req("GET", f"/models/{self.h}/tensors/{name}")
        nd = struct.unpack_from("<I", body)[0]
        dims = struct.unpack_from(f"<{nd}I", body, 4)
        return np.frombuffer(body, np.float32, offset=4 + 4 * nd).reshape(dims)

    def clear(self):
        self._req("POST", f"/models/{self.h}/clear_tensors")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--server", default="http://127.0.0.1:8080")
    p.add_argument("--audio", default="")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--max-tokens", type=int, default=8)
    args = p.parse_args()

    cfg = WHISPER_TINY_TEST
    enc_b, dec_b = build_encoder(cfg), {L: build_decoder(cfg, new_len=L, seed=1) for L in (len(cfg.sot_sequence), 1)}

    enc = HttpModel(args.server)
    for name, arr in enc_b.weights.items():
        enc.add_weights(str(arr.dtype), name, arr)
    enc.read_string(enc_b.to_text())

    decs = {}
    for L, b in dec_b.items():
        m = HttpModel(args.server)
        for name, arr in b.weights.items():
            m.add_weights(str(arr.dtype), name, arr)
        m.read_string(b.to_text())
        decs[L] = m

    audio = read_16bit_raw_audio(args.audio) if args.audio else np.random.RandomState(0).randn(16000).astype(np.float32) * 0.1
    mel = log_mel_spectrogram(audio, n_mels=cfg.n_mels, pad_to=2 * cfg.n_audio_ctx)
    enc.clear()
    enc.add_tensor(mangle("mel"), mel)
    enc.run()
    cross_k = enc.get_tensor(mangle("n_layer_cross_k"))
    cross_v = enc.get_tensor(mangle("n_layer_cross_v"))

    NL, C, d = cfg.n_text_layer, cfg.n_text_ctx, cfg.n_text_state
    self_k = np.zeros((NL, 1, C, d), np.float32)
    self_v = np.zeros((NL, 1, C, d), np.float32)
    tokens_in = list(cfg.sot_sequence)
    offset, out = 0, []
    while len(out) < args.max_tokens:
        m = decs[len(tokens_in)]
        m.clear()
        m.add_tensor(mangle("tokens"), np.asarray([tokens_in], np.int64))
        m.add_tensor(mangle("offset"), np.asarray([offset], np.int64))
        m.add_tensor(mangle("in_n_layer_self_k_cache"), self_k)
        m.add_tensor(mangle("in_n_layer_self_v_cache"), self_v)
        m.add_tensor(mangle("n_layer_cross_k"), cross_k)
        m.add_tensor(mangle("n_layer_cross_v"), cross_v)
        m.run()
        self_k = m.get_tensor(mangle("out_n_layer_self_k_cache"))
        self_v = m.get_tensor(mangle("out_n_layer_self_v_cache"))
        logits = m.get_tensor(mangle("logits"))[0, -1].copy()
        if offset == 0:
            logits[cfg.eot] = logits[cfg.blank_id] = -np.inf
        for t in (cfg.no_timestamps, cfg.sot, cfg.no_speech, cfg.translate):
            logits[t] = -np.inf
        tok = int(np.argmax(logits))
        offset += len(tokens_in)
        if tok == cfg.eot:
            break
        out.append(tok)
        tokens_in = [tok]
    print("tokens:", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
