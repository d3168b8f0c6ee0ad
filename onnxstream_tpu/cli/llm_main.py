"""`llm` CLI — chat with llama-family models (reference src/llm.cpp:39-508).

REPL with chatml (TinyLlama) / [INST] (Mistral) templating, greedy decoding,
streamed tokens, and a device-resident bucketed KV cache. `--synthetic tiny`
runs a small random-weight model for smoke testing.
"""

from __future__ import annotations

import argparse
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="llm", description=__doc__)
    p.add_argument("--models-path", "-m", default="", help="folder with model weights (builder layout) + vocab.txt")
    p.add_argument("--hf-path", default="", help="local HuggingFace llama/mistral checkpoint directory")
    p.add_argument("--model", default="tinyllama", choices=["tinyllama", "mistral"])
    p.add_argument("--synthetic", choices=["tiny"], default="")
    p.add_argument("--prompt", default="", help="single-shot prompt (otherwise REPL)")
    p.add_argument("--max-new-tokens", type=int, default=128)
    p.add_argument("--compute-dtype", default="bfloat16", choices=["float32", "bfloat16", "float16"])
    p.add_argument("--device", default="", choices=["", "cpu", "tpu"])
    p.add_argument("--ops-printf", action="store_true")
    p.add_argument("--download", action="store_true",
                   help="fetch the model from HF into --models-path if missing (reference llm.cpp:137-200)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from onnxstream_tpu.models.llm.llama import LLAMA_TINY, MISTRAL, TINYLLAMA
    from onnxstream_tpu.models.llm.pipeline import LlamaPipeline
    from onnxstream_tpu.models.llm.tokenizer import SentencePieceBPE

    is_tiny = args.model == "tinyllama"
    if args.synthetic:
        cfg = LLAMA_TINY
        # byte-level vocab so any ASCII prompt tokenizes
        tokens = [(0, chr(i)) for i in range(256)]
        tok = SentencePieceBPE(tokens, special=["<s>", "</s>", "[PAD]", "<|im_start|>", "<|im_end|>"])
        pipe = LlamaPipeline(cfg, tokenizer=tok, compute_dtype="float32",
                             buckets=[32, 64, 128], is_tiny_chat=True)
    elif args.hf_path:
        # straight from a transformers checkpoint — no ONNX hop
        import transformers

        from onnxstream_tpu.models.llm.hf import config_from_hf, weights_from_hf_state_dict

        hf = transformers.AutoModelForCausalLM.from_pretrained(args.hf_path)
        cfg = config_from_hf(hf.config)
        weights = weights_from_hf_state_dict(hf.state_dict(), cfg)
        del hf
        hf_tok = transformers.AutoTokenizer.from_pretrained(args.hf_path)

        class _HFTok:
            token2idx = hf_tok.get_vocab()
            idx2token = [hf_tok.convert_ids_to_tokens(i) for i in range(hf_tok.vocab_size)]

            def encode(self, text):
                return hf_tok.encode(text)

            def decode_token(self, tid):
                return hf_tok.decode([tid])

        pipe = LlamaPipeline(cfg, weights=weights, tokenizer=_HFTok(),
                             compute_dtype=args.compute_dtype, is_tiny_chat=is_tiny)
    elif args.models_path:
        import os

        import numpy as np

        if args.download:
            from onnxstream_tpu.utils.download import download_model

            name = "TinyLlama-1.1B-Chat-v0.3-fp16" if is_tiny else "Mistral-7B-Instruct-v0.2-fp16"
            download_model(name, args.models_path)
        cfg = TINYLLAMA if is_tiny else MISTRAL
        tok = SentencePieceBPE.from_file(os.path.join(args.models_path, "vocab.txt"), is_tiny=is_tiny)
        weights = {}
        model_txt = os.path.join(args.models_path, "model.txt")
        declared = {}
        if os.path.exists(model_txt):
            # the downloaded catalog models are the reference's fp16 graphs:
            # each weight ref in model.txt declares its dtype + shape — a
            # blanket np.float32 read would misparse every fp16 .bin
            from onnxstream_tpu.ir import parse_model_txt

            gref = parse_model_txt(open(model_txt).read())
            for op in gref.ops:
                for t in op.inputs:
                    if t.is_weight and t.name:
                        declared[t.name] = t
        for f in os.listdir(args.models_path):
            if not f.endswith(".bin"):
                continue
            path = os.path.join(args.models_path, f)
            spec = declared.get(f)
            if spec is not None:
                arr = np.fromfile(path, spec.dtype.np)
                if spec.shape:
                    arr = arr.reshape(spec.shape)
                weights[f] = arr
            else:
                weights[f] = np.fromfile(path, np.float32)
        pipe = LlamaPipeline(cfg, weights=weights, tokenizer=tok,
                             compute_dtype=args.compute_dtype, is_tiny_chat=is_tiny)
    else:
        print("error: provide --models-path or --synthetic", file=sys.stderr)
        return 2

    import codecs

    # incremental utf-8 assembly: byte-fallback tokens are PARTIAL sequences
    _inc = codecs.getincrementaldecoder("utf-8")("replace")

    def stream(tok_id: int) -> None:
        tk = pipe.tokenizer
        if hasattr(tk, "decode_token_bytes"):
            print(_inc.decode(tk.decode_token_bytes(tok_id)), end="", flush=True)
        else:
            print(tk.decode_token(tok_id), end="", flush=True)

    # warm-up forward (loads weights + compiles; reference llm.cpp:442-454)
    print("Loading weights...", end="", flush=True)
    pipe.forward([1])
    pipe.reset()
    print(" done!")

    if args.prompt:
        t0 = time.time()
        out = pipe.chat_turn(args.prompt, args.max_new_tokens, stream=None)
        dt = time.time() - t0
        n = len(out.split()) + 1
        print(out)
        print(f"\n[{dt:.1f}s]", file=sys.stderr)
        return 0

    while True:
        try:
            prompt = input("\n>>> ")
        except (EOFError, KeyboardInterrupt):
            return 0
        t0 = time.time()
        text = pipe.chat_turn(prompt, args.max_new_tokens, stream=stream)
        if not sys.stdout.isatty():
            print(text, end="")
        ntok = len(pipe.tokenizer.encode(text)) if text else 0
        print(f"\n[{ntok} tokens, {ntok / max(time.time() - t0, 1e-9):.1f} tok/s]", file=sys.stderr)


if __name__ == "__main__":
    sys.exit(main())
