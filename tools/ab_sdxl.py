"""SDXL UNet step A/B over flash-attention tile/packing variants (real chip).

VERDICT r4 #8: SD1.5's step is closed (nine measured levers), but SDXL's
~252 ms step runs the framework's longest self-attention — 4096 tokens at
d=64 per head (plus 1024-token mid blocks) — where the flash kernel is the
one lever family that ever won. This sweeps the kernel's (block_m, block_n)
tiles and the packed-vs-nopad layout at exactly those shapes; the reference's
SDXL-enabling trick is attention slicing at the same sites
(/root/reference/src/onnxstream.cpp:6696-6928, README.md:151-159).

Methodology = tools/ab_unet.py: device-synthesized weights (seed-stable
across variants so outputs stay comparable), warmup forced by a readback,
n chained device-resident steps ended by one readback. Same-hour runs only —
cross-hour numbers are not comparable on the tunneled chip.

Usage: python tools/ab_sdxl.py [variant ...]   (default: all)
       --tiny smoke-tests the harness wiring on CPU-friendly sizes.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from onnxstream_tpu.utils.compile_cache import setup_repo_compile_cache  # noqa: E402

setup_repo_compile_cache()

import numpy as np

# d=64 pads to 128 lanes in the packed kernel (2x HBM copies of Q/K/V vs
# SD1.5's 3.2x at d=40, where nopad LOST); nopad re-tests the trade at 2x.
VARIANTS = {
    "base": {},  # kernel defaults: block_m=512, block_n=1024
    "nopad": {"flash_packed_nopad": True},
    "bm256_bn512": {"flash_block_m": 256, "flash_block_n": 512},
    "bm256_bn1024": {"flash_block_m": 256, "flash_block_n": 1024},
    "bm512_bn512": {"flash_block_m": 512, "flash_block_n": 512},
    "bm1024_bn1024": {"flash_block_m": 1024, "flash_block_n": 1024},
    "bm512_bn2048": {"flash_block_m": 512, "flash_block_n": 2048},
    "bm1024_bn2048": {"flash_block_m": 1024, "flash_block_n": 2048},
}


def main() -> None:
    sel = [a for a in sys.argv[1:] if not a.startswith("-")] or list(VARIANTS)
    tiny = "--tiny" in sys.argv
    n_iter = int(os.environ.get("OSTPU_SWEEP_ITERS", "20"))

    import jax

    # honor JAX_PLATFORMS=cpu for --tiny smoke runs (sitecustomize registers
    # the axon plugin before this script runs; same pattern as bench.py)
    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat:
        jax.config.update("jax_platforms", plat)

    from measure import chained_unet_time, sdxl_graph_and_inputs
    from onnxstream_tpu.runtime.config import SessionConfig
    from onnxstream_tpu.runtime.session import Session
    from onnxstream_tpu.runtime.weights import DictWeightsProvider

    # one graph + one input dict for the whole sweep (same objects as the
    # bench child, so sweep winners transfer to the driver record verbatim)
    _, g, inputs = sdxl_graph_and_inputs(tiny)
    text = g.to_text()
    synth_min_bytes = (1 << 10) if tiny else (1 << 20)

    ref_out = None
    for name in sel:
        t0 = time.time()

        def _mark(stage):
            print(f"# {name} {stage} t+{time.time() - t0:.0f}s",
                  file=sys.stderr, flush=True)

        config = SessionConfig(
            compute_dtype="bfloat16",
            fuse_ops_in_attention=True,
            use_flash_attention=True,
            **VARIANTS[name],
        )
        s = Session(config=config, weights_provider=DictWeightsProvider(g.weights))
        s.read_string(text)
        for k, v in inputs.items():
            s.add_tensor(k, v)
        _mark("session+plan")
        dt_ms, probe = chained_unet_time(
            s, inputs, n_iter, synth_min_bytes, mark=_mark)
        if ref_out is None:
            ref_out = probe
        print(
            json.dumps(
                {
                    "variant": name,
                    "step_ms": round(dt_ms, 2),
                    "graph_ops": len(s.graph.ops),
                    "max_dev_vs_first": round(
                        float(np.abs(probe - ref_out).max()), 4),
                }
            ),
            flush=True,
        )
        s.close()


if __name__ == "__main__":
    main()
