"""Whisper graphs vs the canonical transformers implementation:
random-init HF model -> converted weights -> logits must match."""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

from onnxstream_tpu.models.whisper.model import mangle


@pytest.fixture(scope="module")
def hf_and_ours():
    from onnxstream_tpu.models.whisper.pipeline import WhisperPipeline

    hf_cfg = transformers.WhisperConfig(
        vocab_size=111, num_mel_bins=80, d_model=32,
        encoder_layers=2, encoder_attention_heads=2, max_source_positions=8,
        decoder_layers=2, decoder_attention_heads=2, max_target_positions=16,
        decoder_start_token_id=108, eos_token_id=107, pad_token_id=107,
    )
    torch.manual_seed(0)
    hf = transformers.WhisperForConditionalGeneration(hf_cfg).eval()
    pipe = WhisperPipeline.from_hf(hf)
    return hf, pipe


def _run_decoder(pipe, tokens, offset, sk, sv, ck, cv):
    sess = pipe._decoder(len(tokens))
    sess.clear_tensors()
    sess.add_tensor(mangle("tokens"), np.asarray([tokens], np.int64))
    sess.add_tensor(mangle("offset"), np.asarray([offset], np.int64))
    sess.add_tensor(mangle("in_n_layer_self_k_cache"), sk)
    sess.add_tensor(mangle("in_n_layer_self_v_cache"), sv)
    sess.add_tensor(mangle("n_layer_cross_k"), ck)
    sess.add_tensor(mangle("n_layer_cross_v"), cv)
    out = sess.run()
    return (np.asarray(out[mangle("logits")], np.float32),
            np.asarray(out[mangle("out_n_layer_self_k_cache")]),
            np.asarray(out[mangle("out_n_layer_self_v_cache")]))


def test_encoder_decoder_logits_match(hf_and_ours):
    hf, pipe = hf_and_ours
    cfg = pipe.cfg
    rng = np.random.RandomState(0)
    mel = rng.randn(1, cfg.n_mels, 2 * cfg.n_audio_ctx).astype(np.float32) * 0.5
    dec_ids = [cfg.sot, 5, 9, 42]

    with torch.no_grad():
        ref = hf(input_features=torch.tensor(mel),
                 decoder_input_ids=torch.tensor([dec_ids])).logits[0].numpy()

    pipe.encoder.clear_tensors()
    pipe.encoder.add_tensor(mangle("mel"), mel)
    enc_out = pipe.encoder.run()
    ck = np.asarray(enc_out[mangle("n_layer_cross_k")], np.float32)
    cv = np.asarray(enc_out[mangle("n_layer_cross_v")], np.float32)

    NL, C, d = cfg.n_text_layer, cfg.n_text_ctx, cfg.n_text_state
    zeros = np.zeros((NL, 1, C, d), np.float32)
    logits, sk, sv = _run_decoder(pipe, dec_ids, 0, zeros, zeros, ck, cv)
    np.testing.assert_allclose(logits[0], ref, rtol=3e-3, atol=3e-3)
    assert (np.argmax(logits[0], -1) == np.argmax(ref, -1)).all()

    # decode step against the cache must equal the full-sequence logits
    with torch.no_grad():
        ref2 = hf(input_features=torch.tensor(mel),
                  decoder_input_ids=torch.tensor([dec_ids + [7]])).logits[0, -1].numpy()
    logits2, _, _ = _run_decoder(pipe, [7], len(dec_ids), sk, sv, ck, cv)
    np.testing.assert_allclose(logits2[0, -1], ref2, rtol=3e-3, atol=3e-3)
    assert int(np.argmax(logits2[0, -1])) == int(np.argmax(ref2))
