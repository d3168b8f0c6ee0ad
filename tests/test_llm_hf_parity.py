"""Llama graph parity against the canonical transformers implementation:
random-init HF model -> weight conversion -> logits must match."""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def hf_and_ours():
    from onnxstream_tpu.models.llm.hf import config_from_hf, weights_from_hf_state_dict
    from onnxstream_tpu.models.llm.pipeline import LlamaPipeline

    hf_cfg = transformers.LlamaConfig(
        vocab_size=503, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        attention_bias=False, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    weights = weights_from_hf_state_dict(hf.state_dict(), cfg)
    pipe = LlamaPipeline(cfg, weights=weights, buckets=[16, 32, 64])
    return hf, pipe


def test_prefill_logits_match(hf_and_ours):
    hf, pipe = hf_and_ours
    prompt = [3, 17, 99, 5, 250]
    with torch.no_grad():
        ref = hf(torch.tensor([prompt])).logits[0, -1].numpy()
    _, ours = pipe.forward(prompt)
    # fp32 end-to-end; differences are accumulation order only
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)
    assert int(np.argmax(ours)) == int(np.argmax(ref))


def test_decode_logits_match(hf_and_ours):
    hf, pipe = hf_and_ours
    prompt = [3, 17, 99, 5, 250]
    nxt = 42
    with torch.no_grad():
        ref = hf(torch.tensor([prompt + [nxt]])).logits[0, -1].numpy()
    pipe.reset()
    pipe.forward(prompt, want_logits=False)
    _, ours = pipe.forward([nxt])  # decode step against the device KV cache
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)
    assert int(np.argmax(ours)) == int(np.argmax(ref))


def test_greedy_sequence_matches(hf_and_ours):
    hf, pipe = hf_and_ours
    prompt = [3, 17, 99]
    ids = torch.tensor([prompt])
    with torch.no_grad():
        hf_out = hf.generate(ids, max_new_tokens=6, do_sample=False,
                             pad_token_id=0)[0, len(prompt):].tolist()
    pipe.reset()
    ours = pipe.generate(prompt, max_new_tokens=6)
    assert ours == hf_out
