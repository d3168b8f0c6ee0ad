"""LLM family tests: tokenizer, llama graph, bucketed KV-cache pipeline."""

import numpy as np
import pytest

from onnxstream_tpu.models.llm.llama import LLAMA_TINY, MISTRAL, TINYLLAMA, build_llama, param_count
from onnxstream_tpu.models.llm.pipeline import LlamaPipeline
from onnxstream_tpu.models.llm.tokenizer import SentencePieceBPE, chat_template


# ---------------------------------------------------------------- tokenizer
def test_vocab_file_parse(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("0,<unk>\n0,<s>\n0,</s>\n-1,a\n-2,b\n-3,ab\n0,<0x41>\n")
    tok = SentencePieceBPE.from_file(str(p))
    assert tok.decode_token(6) == "A"  # byte token
    assert tok.token2idx[b"ab"] == 5  # byte-keyed vocab (llm.cpp byte walk)


def test_greedy_score_merge():
    # merge picks the HIGHEST score pair first (reference llm.cpp:316-337)
    tokens = [(0, "a"), (0, "b"), (0, "c"), (-5, "ab"), (-1, "bc"), (-2, "abc")]
    tok = SentencePieceBPE(tokens)
    ids = tok.encode("abc")
    # first merge: bc (score -1) beats ab (-5); then a+bc="abc" exists -> abc
    assert [tok.decode_token(i) for i in ids] == ["abc"]


def test_special_token_matching():
    tokens = [(0, c) for c in "abcdefghijklmnopqrstuvwxyz <>|/_sim"]
    tok = SentencePieceBPE(tokens, special=["<s>", "</s>", "<|im_start|>", "<|im_end|>"])
    ids = tok.encode("<s>hi")
    assert tok.decode_token(ids[0]) == "<s>"


def test_chat_templates():
    assert chat_template("hi", True, False).startswith("<|im_start|>user\nhi")
    assert chat_template("hi", False, False) == "<s>[INST] hi [/INST]"
    assert chat_template("hi", False, True).startswith("</s>")


# ------------------------------------------------------------------- graphs
def test_config_param_counts():
    assert abs(param_count(TINYLLAMA) / 1e9 - 1.1) < 0.15  # TinyLlama 1.1B
    assert abs(param_count(MISTRAL) / 1e9 - 7.2) < 0.3  # Mistral 7B


def test_build_llama_shapes():
    g = build_llama(LLAMA_TINY, new_len=4, past=0)
    outs = g.graph().output_names()
    assert "logits" in outs
    assert f"opkv{2 * LLAMA_TINY.layers - 1}" in outs
    g2 = build_llama(LLAMA_TINY, new_len=1, past=16)
    assert "pkv0" in g2.graph().inputs
    assert "cache_5F_len" in g2.graph().inputs


# ------------------------------------------------------------------ pipeline
@pytest.fixture(scope="module")
def tiny_pipe():
    return LlamaPipeline(LLAMA_TINY, buckets=[16, 32, 64])


def test_incremental_matches_full(tiny_pipe):
    seq = [1, 5, 7, 9, 2, 3]
    _, full = LlamaPipeline(LLAMA_TINY, buckets=[16, 32, 64]).forward(seq)
    tiny_pipe.reset()
    tiny_pipe.forward(seq[:3])
    inc = None
    for t in seq[3:]:
        _, inc = tiny_pipe.forward([t])
    np.testing.assert_allclose(full, inc, rtol=1e-4, atol=1e-4)


def test_bucket_crossing(tiny_pipe):
    # push past length across the 16-bucket boundary; logits stay consistent
    tiny_pipe.reset()
    seq = list(range(1, 21))  # 20 tokens -> crosses past bucket 16
    tiny_pipe.forward(seq[:15])
    out = None
    for t in seq[15:]:
        _, out = tiny_pipe.forward([t])
    _, full = LlamaPipeline(LLAMA_TINY, buckets=[32, 64]).forward(seq)
    np.testing.assert_allclose(full, out, rtol=1e-4, atol=1e-4)


def test_generate_deterministic(tiny_pipe):
    tiny_pipe.reset()
    a = tiny_pipe.generate([1, 2, 3], max_new_tokens=5)
    tiny_pipe.reset()
    b = tiny_pipe.generate([1, 2, 3], max_new_tokens=5)
    assert a == b and len(a) == 5


def test_gqa_shapes():
    # LLAMA_TINY has 4 q heads / 2 kv heads: kv cache stores kv_heads only,
    # padded to the prefill bucket (16)
    p = LlamaPipeline(LLAMA_TINY, buckets=[16, 32])
    p.forward([1, 2, 3])
    assert p.kv[0].shape == (1, LLAMA_TINY.kv_heads, 16, LLAMA_TINY.head_dim)
    assert p.cache_len == 3

def test_argmax_in_graph_matches_logits():
    p = LlamaPipeline(LLAMA_TINY, buckets=[16, 32])
    nxt, logits = p.forward([1, 2, 3])
    assert nxt == int(np.argmax(logits))


def test_chat_turn_synthetic():
    tokens = [(0, chr(i)) for i in range(128)]
    tok = SentencePieceBPE(tokens, special=["<s>", "</s>", "[PAD]", "<|im_start|>", "<|im_end|>"])
    pipe = LlamaPipeline(LLAMA_TINY, tokenizer=tok, buckets=[64, 128])
    out = pipe.chat_turn("hi", max_new_tokens=4)
    assert isinstance(out, str)


def test_llm_cli_single_shot(capsys):
    from onnxstream_tpu.cli.llm_main import main

    rc = main(["--synthetic", "tiny", "--device", "cpu", "--prompt", "hello", "--max-new-tokens", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "done!" in out


def test_generate_on_device_matches_loop():
    """One lax.scan decode program must emit the same greedy tokens as the
    run-per-token loop."""
    from onnxstream_tpu.models.llm.llama import LLAMA_TINY
    from onnxstream_tpu.models.llm.pipeline import LlamaPipeline

    prompt = [3, 17, 99, 5]
    a = LlamaPipeline(LLAMA_TINY, buckets=[8, 16, 32])
    seq = a.generate(prompt, max_new_tokens=8)
    b = LlamaPipeline(LLAMA_TINY, buckets=[8, 16, 32])
    dev = b.generate_on_device(prompt, max_new_tokens=8)
    assert seq == dev
    assert b.cache_len >= a.cache_len - 1  # scan always advances n steps


def test_generate_on_device_stop_token():
    from onnxstream_tpu.models.llm.llama import LLAMA_TINY
    from onnxstream_tpu.models.llm.pipeline import LlamaPipeline

    p = LlamaPipeline(LLAMA_TINY, buckets=[8, 16, 32])
    full = p.generate_on_device([3, 17], max_new_tokens=8)
    assert full  # something came out
    p2 = LlamaPipeline(LLAMA_TINY, buckets=[8, 16, 32])
    stopped = p2.generate_on_device([3, 17], max_new_tokens=8, stop_ids=[full[1]] if len(full) > 1 else [])
    if len(full) > 1:
        assert stopped == full[:1]


def test_generate_on_device_multiturn_matches_host():
    """Multi-turn chat: after a first on-device turn, the KV cache must be
    EXACTLY consistent with the returned tokens so turn 2 matches the host
    loop (review finding: the last token's KV was unwritten and stop
    truncation left hallucinated rows)."""
    from onnxstream_tpu.models.llm.llama import LLAMA_TINY
    from onnxstream_tpu.models.llm.pipeline import LlamaPipeline

    host = LlamaPipeline(LLAMA_TINY, buckets=[8, 16, 32, 64])
    h1 = host.generate([3, 17], max_new_tokens=4)
    h2 = host.generate([5, 9], max_new_tokens=4)

    dev = LlamaPipeline(LLAMA_TINY, buckets=[8, 16, 32, 64])
    d1 = dev.generate_on_device([3, 17], max_new_tokens=4)
    d2 = dev.generate_on_device([5, 9], max_new_tokens=4)
    assert d1 == h1
    assert d2 == h2
    assert dev.cache_len == host.cache_len


def test_generate_on_device_stop_truncation_consistent():
    """A stop token mid-chunk rewinds cache_len to the kept tokens; the next
    turn must still match the host path."""
    from onnxstream_tpu.models.llm.llama import LLAMA_TINY
    from onnxstream_tpu.models.llm.pipeline import LlamaPipeline

    probe = LlamaPipeline(LLAMA_TINY, buckets=[8, 16, 32, 64])
    seq = probe.generate([3, 17], max_new_tokens=6)
    if len(seq) < 3:
        return  # degenerate tiny-model output; nothing to truncate
    stopper = seq[2]

    host = LlamaPipeline(LLAMA_TINY, buckets=[8, 16, 32, 64])
    h1 = host.generate([3, 17], max_new_tokens=6, stop_ids=[stopper])
    h2 = host.generate([5, 9], max_new_tokens=4)

    dev = LlamaPipeline(LLAMA_TINY, buckets=[8, 16, 32, 64])
    d1 = dev.generate_on_device([3, 17], max_new_tokens=6, stop_ids=[stopper])
    d2 = dev.generate_on_device([5, 9], max_new_tokens=4)
    assert d1 == h1 == seq[:2]
    assert dev.cache_len == host.cache_len
    assert d2 == h2


def test_generate_on_device_multichunk_matches_host():
    """Multi-chunk decode must not drop the chunk-carry tokens and must stop
    even when the stop token lands exactly on a chunk carry."""
    host = LlamaPipeline(LLAMA_TINY, buckets=[16, 32, 64])
    h = host.generate([3, 17], max_new_tokens=10)

    dev = LlamaPipeline(LLAMA_TINY, buckets=[16, 32, 64])
    dev.DECODE_CHUNK = 4  # force several chunks within 10 tokens
    assert dev.generate_on_device([3, 17], max_new_tokens=10) == h

    # stop at every generated position: parity incl. carry positions (3, 7)
    for si in range(1, 9):
        st = h[si]
        hp = LlamaPipeline(LLAMA_TINY, buckets=[16, 32, 64])
        hs = hp.generate([3, 17], max_new_tokens=10, stop_ids=[st])
        dp = LlamaPipeline(LLAMA_TINY, buckets=[16, 32, 64])
        dp.DECODE_CHUNK = 4
        assert dp.generate_on_device([3, 17], max_new_tokens=10, stop_ids=[st]) == hs
        # KV rewind after truncation keeps later turns consistent
        assert dp.generate_on_device([5, 9], max_new_tokens=4) == hp.generate(
            [5, 9], max_new_tokens=4)


def test_int8_weights_logits_close_and_quantized():
    """int8_weights mode: every 2-D MatMul weight is percentile-quantized
    per-channel and consumed by the w8_matmul kernel; logits must stay close
    to the bf16-resident pipeline (weight-only quantization, compute dtype
    unchanged)."""
    seq = [3, 17, 99, 5, 2, 11]
    pf = LlamaPipeline(LLAMA_TINY, compute_dtype="bfloat16", buckets=[16, 32])
    _, lf = pf.forward(seq)
    p8 = LlamaPipeline(LLAMA_TINY, compute_dtype="bfloat16", buckets=[16, 32],
                       int8_weights=True)
    _, l8 = p8.forward(seq)

    lf = np.asarray(lf, np.float32)
    l8 = np.asarray(l8, np.float32)
    nrms = np.linalg.norm(l8 - lf) / max(np.linalg.norm(lf), 1e-9)
    assert nrms < 0.15, f"int8 logits drifted: nrms={nrms:.4f}"

    # the force set must actually cover the matmul weights, and the uploads
    # must carry quant params (u8 on the wire, dequant fused in-kernel)
    s = p8._sessions[next(iter(p8._sessions))]
    assert s.config.force_uint8_storage_set
    ex = s._executor()
    quantized = [w for w in ex.plan.arg_weights if w.quant is not None]
    assert len(quantized) >= len(s.config.force_uint8_storage_set)


def test_tokenizer_utf8_byte_fallback():
    """The reference walks UTF-8 BYTES (llm.cpp:288-340): a char absent from
    the vocab as text must seed from its <0xNN> byte tokens — 'é' (U+00E9)
    is <0xC3><0xA9>, NOT the single byte token <0xE9>; chars above U+00FF
    must not crash. Round-trip happens at the byte level."""
    tokens = [(0, "<unk>")]
    byte_ids = {}
    for b in range(256):
        byte_ids[b] = len(tokens)
        tokens.append((0, bytes([b])))
    tokens.append((-1, "hi"))
    tok = SentencePieceBPE(tokens)

    ids = tok.encode("é")
    assert ids == [byte_ids[0xC3], byte_ids[0xA9]], ids
    # the single-byte token <0xE9> must NOT be chosen
    assert byte_ids[0xE9] not in ids

    snow = "☃"  # U+2603 -> E2 98 83; crashed the codepoint walk
    ids = tok.encode(snow)
    assert [tok.decode_token_bytes(i) for i in ids] == [b"\xe2", b"\x98", b"\x83"]
    assert b"".join(tok.decode_token_bytes(i) for i in ids).decode("utf-8") == snow

    # merges still operate over byte strings
    assert tok.encode("hi") == [len(tokens) - 1]
