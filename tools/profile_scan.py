"""Device-timeline profile of the SD1.5 on-device diffusion scan.

The executor path runs the same UNet at ~11 ms/step (tools/profile_unet.py)
but generate_on_device's lax.scan measured ~900 ms/step (tools/
breakdown_sd15.py). This traces ONE warm scan call so the while-loop body's
op mix can be read from the trace and compared against the executor's.

Usage: python tools/profile_scan.py [--outdir /tmp/scan_trace]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ostpu_jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    outdir = "/tmp/scan_trace"
    if "--outdir" in sys.argv:
        outdir = sys.argv[sys.argv.index("--outdir") + 1]
    import jax

    from onnxstream_tpu.models.sd.pipeline import StableDiffusionPipeline

    t0 = time.time()
    xl = "--xl" in sys.argv
    pipe = StableDiffusionPipeline.from_synthetic(
        tiny=False, xl=xl, compute_dtype="bfloat16", on_device=True)
    print(json.dumps({"stage": "build", "s": round(time.time() - t0, 1)}), flush=True)

    prompt = "a photo of an astronaut riding a horse on mars"
    t0 = time.time()
    r = pipe.generate_on_device(prompt, steps=10, seed=42, sampler="euler_a", decode=False)
    print(json.dumps({"stage": "warm", "s": round(time.time() - t0, 1)}), flush=True)

    with jax.profiler.trace(outdir):
        t0 = time.time()
        r = pipe.generate_on_device(prompt, steps=10, seed=42, sampler="euler_a", decode=False)
        dt = time.time() - t0
    print(json.dumps({"stage": "traced_scan", "s": round(dt, 2),
                      "finite": bool(np.isfinite(r.latents).all()), "outdir": outdir}), flush=True)


if __name__ == "__main__":
    main()
