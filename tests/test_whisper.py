"""Whisper family: mel frontend, encoder/decoder graphs, greedy pipeline."""

import numpy as np
import pytest

from onnxstream_tpu.models.whisper import WHISPER_TINY_TEST, WhisperPipeline
from onnxstream_tpu.models.whisper.mel import (
    librosa_mel_banks,
    log_mel_spectrogram,
)
from onnxstream_tpu.models.whisper.model import mangle


def test_mel_shape_and_norm():
    a = np.sin(2 * np.pi * 440 * np.arange(16000) / 16000).astype(np.float32)
    m = log_mel_spectrogram(a)
    assert m.shape == (1, 80, 3000)
    # (log_spec + 4)/4 with clamp at max-8 bounds the range to [max-2, max]
    assert m.max() - m.min() <= 2.0 + 1e-6


def test_mel_banks_properties():
    banks = librosa_mel_banks()
    assert banks.shape == (80, 201)
    # triangles are non-negative and every bin is non-empty
    assert banks.min() >= 0
    assert (banks.sum(axis=1) > 0).all()
    # band centers increase monotonically
    centers = banks.argmax(axis=1)
    assert (np.diff(centers) >= 0).all()


def test_mel_silence_padding():
    m = log_mel_spectrogram(np.zeros(3200, np.float32))
    n_frames = (3200 - 400) // 160 + 1
    # silence normalizes to (log10(1e-10)+4)/4 = -1.5; the 1500-frame pad is
    # appended as literal zeros (reference process_features, index.html:555-560)
    assert np.allclose(m[0, :, :n_frames], -1.5)
    assert np.allclose(m[0, :, n_frames : n_frames + 100], 0.0)


@pytest.fixture(scope="module")
def pipe():
    return WhisperPipeline.from_synthetic()


def test_transcribe_greedy(pipe):
    audio = np.random.RandomState(0).randn(16000).astype(np.float32) * 0.1
    toks = pipe.transcribe(audio, max_tokens=6)
    assert 0 < len(toks) <= 6
    cfg = pipe.cfg
    for t in (cfg.sot, cfg.no_timestamps, cfg.no_speech, cfg.translate, cfg.eot):
        assert t not in toks
    assert toks == pipe.transcribe(audio, max_tokens=6)


def test_audio_changes_output(pipe):
    a = np.random.RandomState(1).randn(16000).astype(np.float32) * 0.1
    b = np.sin(2 * np.pi * 300 * np.arange(16000) / 16000).astype(np.float32)
    assert pipe.transcribe(a, max_tokens=5) != pipe.transcribe(b, max_tokens=5)


def test_incremental_matches_full_prefill(pipe):
    """Step-by-step decode over the fixed self-KV buffer must equal one
    whole-sequence pass (the reference trusts the same invariant when it
    alternates sot_sequence then 1-token steps, index.html:1027-1030)."""
    cfg = pipe.cfg
    seq = [cfg.sot, cfg.sot + 1, cfg.transcribe, cfg.no_timestamps, 5, 12]
    NL, C, d, Ta = cfg.n_text_layer, cfg.n_text_ctx, cfg.n_text_state, cfg.n_audio_ctx
    rng = np.random.RandomState(3)
    cross_k = rng.rand(NL, 1, Ta, d).astype(np.float32)
    cross_v = rng.rand(NL, 1, Ta, d).astype(np.float32)

    def run(sess, tokens, offset, sk, sv):
        sess.clear_tensors()
        sess.add_tensor(mangle("tokens"), np.asarray([tokens], np.int64))
        sess.add_tensor(mangle("offset"), np.asarray([offset], np.int64))
        sess.add_tensor(mangle("in_n_layer_self_k_cache"), sk)
        sess.add_tensor(mangle("in_n_layer_self_v_cache"), sv)
        sess.add_tensor(mangle("n_layer_cross_k"), cross_k)
        sess.add_tensor(mangle("n_layer_cross_v"), cross_v)
        out = sess.run()
        return (np.asarray(out[mangle("logits")], np.float32),
                np.asarray(out[mangle("out_n_layer_self_k_cache")]),
                np.asarray(out[mangle("out_n_layer_self_v_cache")]))

    # full pass: all 6 tokens at offset 0
    full_logits, _, _ = run(pipe._decoder(len(seq)), seq, 0, np.zeros((NL, 1, C, d), np.float32), np.zeros((NL, 1, C, d), np.float32))

    # incremental: prefill 4 then 2 single steps
    sk = np.zeros((NL, 1, C, d), np.float32)
    sv = np.zeros((NL, 1, C, d), np.float32)
    lg, sk, sv = run(pipe._decoder(4), seq[:4], 0, sk, sv)
    np.testing.assert_allclose(lg[0], full_logits[0, :4], rtol=1e-4, atol=1e-5)
    lg, sk, sv = run(pipe._decoder(1), [seq[4]], 4, sk, sv)
    np.testing.assert_allclose(lg[0, 0], full_logits[0, 4], rtol=1e-4, atol=1e-5)
    lg, sk, sv = run(pipe._decoder(1), [seq[5]], 5, sk, sv)
    np.testing.assert_allclose(lg[0, 0], full_logits[0, 5], rtol=1e-4, atol=1e-5)


def test_first_step_suppresses_eot(pipe):
    # even on silence the first emitted token can never be eot/blank
    toks = pipe.transcribe(np.zeros(8000, np.float32), max_tokens=1)
    assert len(toks) == 1
    assert toks[0] not in (pipe.cfg.eot, pipe.cfg.blank_id)


def test_whisper_cli(tmp_path, capsys):
    from onnxstream_tpu.cli.whisper_main import main

    raw = tmp_path / "audio.raw"
    (np.random.RandomState(0).randn(16000) * 3276).astype("<i2").tofile(str(raw))
    rc = main(["--synthetic", "--audio", str(raw), "--max-tokens", "4"])
    assert rc == 0
    assert "tokens:" in capsys.readouterr().out
