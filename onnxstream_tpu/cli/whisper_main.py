"""`whisper` CLI — speech-to-text.

TPU-native counterpart of the reference Whisper browser example (reference
examples/Whisper_wasm/index.html): raw 16-bit 16 kHz audio -> log-mel ->
encoder -> greedy decoder with token suppression. `--synthetic` runs the
tiny random-weight config; `--models-path` loads converted encoder_fp32/ +
decoder_fp32/ model.txt directories.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="whisper", description=__doc__)
    p.add_argument("--audio", required=True, help="16-bit little-endian 16 kHz mono raw file (e.g. the reference's jfk.raw)")
    p.add_argument("--models-path", "-m", default="")
    p.add_argument("--synthetic", action="store_true", help="tiny random-weight models")
    p.add_argument("--max-tokens", type=int, default=0)
    p.add_argument("--language-token", type=int, default=-1)
    p.add_argument("--compute-dtype", default="float32", choices=["float32", "bfloat16"])
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from onnxstream_tpu.models.whisper import WHISPER_BASE, WhisperPipeline
    from onnxstream_tpu.models.whisper.mel import read_16bit_raw_audio

    if args.synthetic:
        pipe = WhisperPipeline.from_synthetic(compute_dtype=args.compute_dtype)
    elif args.models_path:
        pipe = WhisperPipeline.from_dir(args.models_path, WHISPER_BASE,
                                        compute_dtype=args.compute_dtype)
    else:
        print("error: provide --models-path or --synthetic", file=sys.stderr)
        return 2

    audio = read_16bit_raw_audio(args.audio)
    toks = pipe.transcribe(
        audio,
        max_tokens=args.max_tokens or None,
        language_token=args.language_token if args.language_token >= 0 else None,
    )
    print("tokens:", toks)
    if pipe.id_to_token:
        print("text:", pipe.decode_text(toks))
    return 0


if __name__ == "__main__":
    sys.exit(main())
