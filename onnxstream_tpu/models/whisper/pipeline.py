"""Whisper transcription pipeline: audio -> mel -> encoder -> greedy decode.

Mirrors the reference browser example's inference loop (reference
examples/Whisper_wasm/index.html:985-1075):

  * encoder runs once per 30 s window producing stacked cross K/V;
  * the decoder starts from the sot_sequence (sot, language, transcribe,
    no_timestamps) and decodes greedily one token at a time;
  * token suppression: eot and blank at the first step, and always
    no_timestamps / sot / no_speech / translate (index.html:1039-1046);
  * self-KV is a fixed n_text_ctx buffer fed back between steps with an
    `offset` scalar — kept on device here (KV never crosses PCIe).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from onnxstream_tpu.models.whisper.mel import log_mel_spectrogram
from onnxstream_tpu.models.whisper.model import (
    WHISPER_TINY_TEST,
    WhisperConfig,
    build_decoder,
    build_encoder,
    mangle,
)
from onnxstream_tpu.runtime.config import SessionConfig
from onnxstream_tpu.runtime.session import Session
from onnxstream_tpu.runtime.weights import DictWeightsProvider


class WhisperPipeline:
    def __init__(self, cfg: WhisperConfig, encoder: Session, make_decoder,
                 id_to_token: Optional[Dict[int, str]] = None):
        self.cfg = cfg
        self.encoder = encoder
        self._make_decoder = make_decoder  # L -> Session
        self._decoders: Dict[int, Session] = {}
        self.id_to_token = id_to_token or {}

    # ------------------------------------------------------------ constructors
    @classmethod
    def from_synthetic(cls, cfg: WhisperConfig = WHISPER_TINY_TEST, seed: int = 0,
                       compute_dtype: str = "float32",
                       on_device: bool = False) -> "WhisperPipeline":
        # on_device: big float weights device-synthesize instead of
        # uploading (timing-only, same contract as the SD/LLM perf paths)
        enc_b = build_encoder(cfg, seed=seed)

        def mk(builder):
            s = Session(
                config=SessionConfig(compute_dtype=compute_dtype, fuse_ops_in_attention=True,
                                     synthetic_device_weights=on_device),
                weights_provider=DictWeightsProvider(builder.weights),
            )
            s.read_string(builder.to_text())
            return s

        enc = mk(enc_b)

        def make_decoder(L: int) -> Session:
            # same seed for every L -> identical parameter randn streams, so
            # the prefill and decode graphs share one set of weights; the
            # L-dependent structural constants (masks, reshape shapes) stay
            # with their own builder
            return mk(build_decoder(cfg, new_len=L, seed=seed + 1))

        return cls(cfg, enc, make_decoder)

    @classmethod
    def from_hf(cls, hf_model, compute_dtype: str = "float32") -> "WhisperPipeline":
        """Straight from a transformers WhisperForConditionalGeneration
        (no ONNX hop): weights convert to the builder graphs."""
        from onnxstream_tpu.models.whisper.hf import (
            config_from_hf,
            specials_from_generation_config,
            weights_from_hf_state_dict,
        )

        cfg = config_from_hf(hf_model.config)
        # English-only (.en) checkpoints shift the special-token ids by one;
        # the generation config carries the real values
        specials_from_generation_config(cfg, getattr(hf_model, "generation_config", None))
        enc_w, dec_w = weights_from_hf_state_dict(hf_model.state_dict(), cfg)

        def mk(builder, overrides):
            weights = dict(builder.weights)
            weights.update(overrides)
            s = Session(
                config=SessionConfig(compute_dtype=compute_dtype, fuse_ops_in_attention=True),
                weights_provider=DictWeightsProvider(weights),
            )
            s.read_string(builder.to_text())
            return s

        enc = mk(build_encoder(cfg), enc_w)

        def make_decoder(L: int) -> Session:
            return mk(build_decoder(cfg, new_len=L), dec_w)

        return cls(cfg, enc, make_decoder)

    @classmethod
    def from_dir(cls, path: str, cfg: WhisperConfig, provider: str = "ram+prefetch",
                 compute_dtype: str = "float32") -> "WhisperPipeline":
        """Reference layout: {path}/encoder_fp32/model.txt + decoder_fp32/ +
        tokens file (the browser example fetches the same pieces)."""
        import os

        def mk(sub):
            s = Session(config=SessionConfig(compute_dtype=compute_dtype,
                                             fuse_ops_in_attention=True),
                        weights_provider_name=provider)
            s.read_file(os.path.join(path, sub, "model.txt"))
            return s

        enc = mk("encoder_fp32")
        dec = mk("decoder_fp32")
        return cls(cfg, enc, lambda L: dec)

    # ---------------------------------------------------------------- decoding
    def _decoder(self, L: int) -> Session:
        if L not in self._decoders:
            self._decoders[L] = self._make_decoder(L)
        return self._decoders[L]

    def transcribe(self, audio: np.ndarray, max_tokens: Optional[int] = None,
                   language_token: Optional[int] = None) -> List[int]:
        """Greedy transcription; returns the emitted token ids (no specials)."""
        cfg = self.cfg
        mel = log_mel_spectrogram(audio, n_mels=cfg.n_mels, pad_to=2 * cfg.n_audio_ctx)

        self.encoder.clear_tensors()
        self.encoder.add_tensor(mangle("mel"), mel)
        enc_out = self.encoder.run(device_outputs=True)
        cross_k = enc_out[mangle("n_layer_cross_k")]
        cross_v = enc_out[mangle("n_layer_cross_v")]

        NL, C, d = cfg.n_text_layer, cfg.n_text_ctx, cfg.n_text_state
        self_k = np.zeros((NL, 1, C, d), np.float32)
        self_v = np.zeros((NL, 1, C, d), np.float32)

        sot_sequence = list(cfg.sot_sequence)
        if language_token is not None:
            sot_sequence[1] = language_token
        tokens_in: List[int] = sot_sequence
        out_tokens: List[int] = []
        offset = 0
        budget = max_tokens if max_tokens is not None else cfg.n_text_ctx - len(sot_sequence) - 1

        while len(out_tokens) < budget and offset + len(tokens_in) <= cfg.n_text_ctx:
            sess = self._decoder(len(tokens_in))
            sess.clear_tensors()
            sess.add_tensor(mangle("tokens"), np.asarray([tokens_in], np.int64))
            sess.add_tensor(mangle("offset"), np.asarray([offset], np.int64))
            sess.add_tensor(mangle("in_n_layer_self_k_cache"), self_k)
            sess.add_tensor(mangle("in_n_layer_self_v_cache"), self_v)
            sess.add_tensor(mangle("n_layer_cross_k"), cross_k)
            sess.add_tensor(mangle("n_layer_cross_v"), cross_v)
            out = sess.run(device_outputs=True)
            self_k = out[mangle("out_n_layer_self_k_cache")]
            self_v = out[mangle("out_n_layer_self_v_cache")]
            logits = np.asarray(out[mangle("logits")], np.float32)[0, -1].copy()

            # suppression (reference index.html:1039-1046)
            if offset == 0:
                logits[cfg.eot] = -np.inf
                logits[cfg.blank_id] = -np.inf
            for t in (cfg.no_timestamps, cfg.sot, cfg.no_speech, cfg.translate):
                logits[t] = -np.inf

            tok = int(np.argmax(logits))
            offset += len(tokens_in)
            if tok == cfg.eot:
                break
            out_tokens.append(tok)
            tokens_in = [tok]
        return out_tokens

    def decode_text(self, token_ids: List[int]) -> str:
        return "".join(self.id_to_token.get(t, f"<{t}>") for t in token_ids)
