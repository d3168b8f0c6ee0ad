"""Export the Whisper encoder/decoder graphs + weights + goldens for the
in-tab browser demo (examples/whisper_browser/index.html).

The reference ships Whisper as a fully in-tab WASM example (reference
examples/Whisper_wasm/index.html); our in-tab runtime is api/interp.js, which
needs the graphs as static files. This tool writes, under OUTDIR:

    encoder/model.txt  + the encoder weight .bin files (nested paths ok)
    decoder_l4/model.txt, decoder_l1/model.txt + decoder weights
    audio.bin   deterministic synthetic 1 s test audio (float32)
    mel.bin     golden log-mel features from the Python frontend (mel.py)
    meta.json   config, golden tokens from the Python runtime, frame count

The goldens let the page's window.runParity() assert cross-runtime agreement
(mel max|dev|, exact token match) — the print_max_dist discipline (reference
sd.cpp:860-876) applied to the whole STT flow.

Usage: python tools/export_whisper_intab.py [outdir]
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from onnxstream_tpu.models.whisper.mel import log_mel_spectrogram
from onnxstream_tpu.models.whisper.model import (
    WHISPER_TINY_TEST,
    build_decoder,
    build_encoder,
    mangle,
)
from onnxstream_tpu.runtime.config import SessionConfig
from onnxstream_tpu.runtime.session import Session
from onnxstream_tpu.runtime.weights import DictWeightsProvider

MAX_TOKENS = 8


def write_graph(builder, outdir: str) -> None:
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "model.txt"), "w") as f:
        f.write(builder.to_text())
    for name, arr in builder.weights.items():
        path = os.path.join(outdir, name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.ascontiguousarray(arr).tofile(path)


def session_for(builder) -> Session:
    s = Session(config=SessionConfig(compute_dtype="float32"),
                weights_provider=DictWeightsProvider(dict(builder.weights)))
    s.read_string(builder.to_text())
    return s


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/whisper_intab"
    cfg = WHISPER_TINY_TEST
    enc_b = build_encoder(cfg)
    dec_b = {L: build_decoder(cfg, new_len=L, seed=1)
             for L in (len(cfg.sot_sequence), 1)}

    write_graph(enc_b, os.path.join(outdir, "encoder"))
    for L, b in dec_b.items():
        write_graph(b, os.path.join(outdir, f"decoder_l{L}"))

    # deterministic test audio (same generator as examples/whisper_http/run.py)
    audio = np.random.RandomState(0).randn(16000).astype(np.float32) * 0.1
    audio.tofile(os.path.join(outdir, "audio.bin"))
    mel = log_mel_spectrogram(audio, n_mels=cfg.n_mels, pad_to=2 * cfg.n_audio_ctx)
    mel.tofile(os.path.join(outdir, "mel.bin"))

    # golden run through the Python runtime (the same greedy loop the page
    # ports; suppression rules as in examples/whisper_http/run.py:127-130)
    enc = session_for(enc_b)
    enc.add_tensor(mangle("mel"), mel)
    eout = enc.run()
    cross_k = np.asarray(eout[mangle("n_layer_cross_k")], np.float32)
    cross_v = np.asarray(eout[mangle("n_layer_cross_v")], np.float32)

    decs = {L: session_for(b) for L, b in dec_b.items()}
    NL, C, d = cfg.n_text_layer, cfg.n_text_ctx, cfg.n_text_state
    self_k = np.zeros((NL, 1, C, d), np.float32)
    self_v = np.zeros((NL, 1, C, d), np.float32)
    tokens_in = list(cfg.sot_sequence)
    offset, out = 0, []
    while len(out) < MAX_TOKENS:
        m = decs[len(tokens_in)]
        m.clear_tensors()
        m.add_tensor(mangle("tokens"), np.asarray([tokens_in], np.int64))
        m.add_tensor(mangle("offset"), np.asarray([offset], np.int64))
        m.add_tensor(mangle("in_n_layer_self_k_cache"), self_k)
        m.add_tensor(mangle("in_n_layer_self_v_cache"), self_v)
        m.add_tensor(mangle("n_layer_cross_k"), cross_k)
        m.add_tensor(mangle("n_layer_cross_v"), cross_v)
        r = m.run()
        self_k = np.asarray(r[mangle("out_n_layer_self_k_cache")], np.float32)
        self_v = np.asarray(r[mangle("out_n_layer_self_v_cache")], np.float32)
        logits = np.asarray(r[mangle("logits")], np.float32)[0, -1].copy()
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

    meta = {
        "config": {
            "n_mels": cfg.n_mels, "n_vocab": cfg.n_vocab,
            "n_audio_ctx": cfg.n_audio_ctx, "n_text_ctx": cfg.n_text_ctx,
            "n_text_state": cfg.n_text_state, "n_text_layer": cfg.n_text_layer,
            "sot": cfg.sot, "eot": cfg.eot, "blank_id": cfg.blank_id,
            "no_timestamps": cfg.no_timestamps, "no_speech": cfg.no_speech,
            "translate": cfg.translate,
            "sot_sequence": list(cfg.sot_sequence),
        },
        "mel_frames": int(mel.shape[2]),
        "golden_tokens": out,
        "max_tokens": MAX_TOKENS,
    }
    with open(os.path.join(outdir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(f"exported to {outdir}; golden tokens: {out}")


if __name__ == "__main__":
    main()
