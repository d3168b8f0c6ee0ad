"""`sd` CLI — Stable Diffusion image generation.

Flag surface mirrors the reference `sd` executable (reference src/sd.cpp:2691-
3329, README.md:329-355): prompt/neg-prompt/steps/seed/sampler/res, model
path, latents save/decode, previews, tiled decode, N images, embedded
parameters, ops tracing. `--synthetic` runs the architecture-faithful
random-weight models (no downloads needed — the reference instead fetches
weights from HF with curl, sd.cpp:3101-3199).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="sd", description=__doc__)
    p.add_argument("--models-path", "-m", default="", help="folder with converted models (reference layout)")
    p.add_argument("--prompt", default="a photo of an astronaut riding a horse on mars")
    p.add_argument("--neg-prompt", default="")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--seed", type=int, default=-1)
    p.add_argument("--sampler", default="euler_a")
    p.add_argument("--res", default="512x512")
    p.add_argument("--output", "-o", default="result.png")
    p.add_argument("--num", type=int, default=1, help="number of images")
    p.add_argument("--xl", action="store_true", help="SDXL")
    p.add_argument("--turbo", action="store_true", help="SDXL Turbo (no CFG)")
    p.add_argument("--cfg-scale", type=float, default=7.0)
    p.add_argument("--save-latents", default="")
    p.add_argument("--decode-latents", default="")
    p.add_argument("--preview-steps", action="store_true",
                   help="save a low-res latent-RGB projection per step")
    p.add_argument("--decode-steps", action="store_true",
                   help="full VAE decode per step (reference sd.cpp:1745-1768)")
    p.add_argument("--not-tiled", action="store_true",
                   help="full (non-tiled) VAE decode; tiled is the default, "
                        "matching the reference sd executable (sd.cpp m_tiled)")
    p.add_argument("--tiled", action="store_true",
                   help="force tiled VAE decode (already the default)")
    p.add_argument("--embed-parameters", action="store_true")
    p.add_argument("--ops-printf", action="store_true")
    p.add_argument("--ops-times", action="store_true")
    p.add_argument("--compute-dtype", default="bfloat16", choices=["float32", "bfloat16", "float16"])
    p.add_argument("--ram", action="store_true", help="weights resident (default on TPU)")
    p.add_argument("--hbm-budget-mb", type=int, default=0, help="stream weights within this HBM budget")
    p.add_argument("--synthetic", choices=["tiny", "sd15"], default="", help="run random-weight models")
    p.add_argument("--download", action="store_true",
                   help="fetch the model from HF into --models-path if missing (reference sd.cpp:3101-3199)")
    p.add_argument("--decoder-calibrate", action="store_true")
    p.add_argument("--host-loop", action="store_true",
                   help="force the per-step host diffusion loop (default: one on-device program for euler samplers)")
    p.add_argument("--device", default="", choices=["", "cpu", "tpu"], help="force jax backend")
    return p


def _suffixed(path: str, suffix: str) -> str:
    """result.png + _0 -> result_0.png — splitext, NOT str.replace on the
    first dot, which corrupted dotted directories ('./result.png')."""
    import os

    root, ext = os.path.splitext(path)
    return f"{root}{suffix}{ext or '.png'}"


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.device:
        import jax

        jax.config.update("jax_platforms", "cpu" if args.device == "cpu" else None)
    from onnxstream_tpu.models.sd.pipeline import StableDiffusionPipeline, save_image

    w, h = (int(v) for v in args.res.split("x"))
    seed = args.seed if args.seed >= 0 else int(time.time()) % 100000

    if args.synthetic:
        pipe = StableDiffusionPipeline.from_synthetic(tiny=args.synthetic == "tiny",
                                                      compute_dtype=args.compute_dtype,
                                                      xl=args.xl, turbo=args.turbo)
    elif args.models_path:
        if args.download:
            from onnxstream_tpu.utils.download import download_model

            name = ("stable-diffusion-xl-turbo-1.0" if args.turbo
                    else "stable-diffusion-xl-base-1.0" if args.xl
                    else "stable-diffusion-1.5")
            download_model(name, args.models_path)
        pipe = StableDiffusionPipeline.from_dir(
            args.models_path, xl=args.xl, turbo=args.turbo,
            compute_dtype=args.compute_dtype, res=(w, h),
            hbm_budget_bytes=args.hbm_budget_mb << 20,
        )
    else:
        print("error: provide --models-path or --synthetic", file=sys.stderr)
        return 2

    if args.ops_printf:
        pipe.unet.config.ops_printf = True
    if args.ops_times:
        pipe.unet.config.ops_times_printf = True
    if args.decoder_calibrate and pipe.vae_decoder is not None:
        pipe.vae_decoder.config.range_data_calibrate = True

    if args.decode_latents:
        lat = StableDiffusionPipeline.load_latents(args.decode_latents, pipe.lath, pipe.latw)
        img = pipe.decode(lat, tiled=args.tiled or not args.not_tiled)
        save_image(img, args.output)
        print(f"decoded {args.decode_latents} -> {args.output}")
        return 0

    for n in range(args.num):
        t0 = time.time()
        # euler-family runs without previews execute the whole diffusion loop
        # as one device program (latents cross PCIe once)
        on_device = (args.sampler in ("euler", "euler_a") and not args.preview_steps
                     and not args.decode_steps and not args.host_loop)
        if on_device:
            res = pipe.generate_on_device(
                args.prompt, args.neg_prompt, steps=args.steps, seed=seed + n,
                sampler=args.sampler, cfg_scale=args.cfg_scale,
                decode=not args.save_latents,
                tiled_decode=args.tiled or not args.not_tiled,
            )
        else:
            res = pipe.generate(
                args.prompt,
                args.neg_prompt,
                steps=args.steps,
                seed=seed + n,
                sampler=args.sampler,
                cfg_scale=args.cfg_scale,
                decode=not args.save_latents,
                tiled_decode=args.tiled or not args.not_tiled,
                preview_steps=args.preview_steps,
                decode_steps=args.decode_steps,
            )
        out = args.output if args.num == 1 else _suffixed(args.output, f"_{n}")
        if args.save_latents:
            StableDiffusionPipeline.save_latents(args.save_latents, res.latents)
            print(f"saved latents -> {args.save_latents}")
        elif res.image is not None:
            params = (
                f"{args.prompt}\nNegative prompt: {args.neg_prompt}\n"
                f"Steps: {args.steps}, Sampler: {args.sampler}, CFG scale: {args.cfg_scale}, "
                f"Seed: {seed + n}, Size: {w}x{h}"
            ) if args.embed_parameters else None
            save_image(res.image, out, parameters=params)
            print(f"image {n + 1}/{args.num} -> {out}  ({time.time() - t0:.1f}s)")
        if args.preview_steps:
            from onnxstream_tpu.models.sd.pipeline import upscale8x

            for i, pv in enumerate(res.previews):
                save_image(upscale8x(pv), _suffixed(out, f"_preview_{i}"))
        for i, im in enumerate(res.step_images):
            save_image(im, _suffixed(out, f"_{i}"))

    if args.decoder_calibrate and pipe.vae_decoder is not None:
        ex = pipe.vae_decoder._executor()
        path = "range_data.txt"
        ex.range_data.write(path)
        print(f"calibration ranges -> {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
