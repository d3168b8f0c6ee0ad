"""Stage breakdown of the SD1.5 warm e2e (perf work).

measure.py reports the whole generate_on_device() wall; this isolates the
stages so a regression can be attributed: text encode, the 10-step on-device
diffusion scan (timed twice), the VAE decode, and the readbacks. Timing
discipline per docs/tpu_notes.md (warm first with the identical call, force
with a readback, then time).

Usage: python tools/breakdown_sd15.py [--tiny]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ostpu_jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    tiny = "--tiny" in sys.argv
    from onnxstream_tpu.models.sd.pipeline import StableDiffusionPipeline

    t0 = time.time()
    pipe = StableDiffusionPipeline.from_synthetic(tiny=tiny, compute_dtype="bfloat16")
    _emit(stage="build", s=round(time.time() - t0, 1))

    prompt = "a photo of an astronaut riding a horse on mars"
    neg = ""

    # full warm pass first: compiles everything
    t0 = time.time()
    res = pipe.generate_on_device(prompt, steps=10, seed=42, sampler="euler_a", decode=True)
    _emit(stage="cold_e2e", s=round(time.time() - t0, 1))
    t0 = time.time()
    res = pipe.generate_on_device(prompt, steps=10, seed=42, sampler="euler_a", decode=True)
    _emit(stage="warm_e2e", s=round(time.time() - t0, 2))

    # stage: text encode (both branches, as the e2e does)
    for rep in range(2):
        t0 = time.time()
        cond = pipe.encode_prompt(prompt)
        uncond = pipe.encode_prompt(neg)
        np.asarray(cond["context"] if isinstance(cond, dict) else cond)
        _emit(stage=f"encode_x2/{rep}", s=round(time.time() - t0, 2))

    # stage: the diffusion scan alone (no decode)
    for rep in range(2):
        t0 = time.time()
        r2 = pipe.generate_on_device(prompt, steps=10, seed=42, sampler="euler_a", decode=False)
        _emit(stage=f"scan10_nodecode/{rep}", s=round(time.time() - t0, 2))

    # stage: decode alone (latents already on host)
    for rep in range(2):
        t0 = time.time()
        img = pipe.decode(r2.latents, tiled=False)
        _emit(stage=f"decode/{rep}", s=round(time.time() - t0, 2), image=list(np.shape(img)))


if __name__ == "__main__":
    main()
