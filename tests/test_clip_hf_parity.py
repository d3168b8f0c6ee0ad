"""CLIP text-encoder graph vs transformers: hidden states and pooled output."""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def test_clip_text_encoder_matches_hf():
    from onnxstream_tpu.models.sd.clip import build_text_encoder
    from onnxstream_tpu.models.sd.hf import clip_config_from_hf, clip_weights_from_hf_state_dict
    from onnxstream_tpu.runtime.config import SessionConfig
    from onnxstream_tpu.runtime.session import Session
    from onnxstream_tpu.runtime.weights import DictWeightsProvider

    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=120, hidden_size=32, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2, max_position_embeddings=9,
        hidden_act="quick_gelu", eos_token_id=119, bos_token_id=118, pad_token_id=119,
    )
    torch.manual_seed(0)
    hf = transformers.CLIPTextModelWithProjection(hf_cfg).eval()

    cfg = clip_config_from_hf(hf_cfg, pooled=True)
    b = build_text_encoder(cfg)
    weights = dict(b.weights)
    weights.update(clip_weights_from_hf_state_dict(hf.state_dict(), cfg))

    s = Session(config=SessionConfig(), weights_provider=DictWeightsProvider(weights))
    s.read_string(b.to_text())

    # eos (the highest id) at the final position, like the pipeline's chunks
    toks = np.array([[118, 5, 9, 42, 7, 3, 2, 1, 119]], np.int64)
    s.add_tensor("tokens", toks)
    out = s.run()

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(toks))

    np.testing.assert_allclose(
        np.asarray(out["last_hidden_state"], np.float32),
        ref.last_hidden_state.numpy(), rtol=2e-3, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["pooled_output"], np.float32),
        ref.text_embeds.numpy(), rtol=2e-3, atol=2e-3,
    )
    # penultimate hidden state (what SDXL consumes) also matches
    with torch.no_grad():
        ref_h = hf(input_ids=torch.tensor(toks), output_hidden_states=True).hidden_states[-2]
    np.testing.assert_allclose(
        np.asarray(out["penultimate_hidden_state"], np.float32),
        ref_h.numpy(), rtol=2e-3, atol=2e-3,
    )
