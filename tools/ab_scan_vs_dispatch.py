"""A/B: the SAME batch-1 UNet forward as (a) a host dispatch loop (the
headline methodology) vs (b) one jitted lax.scan chaining the steps on
device (the generate_on_device shape).

Motivation (2026-08-20): breakdown_sd15 reads ~45-50 ms per CFG step out of
the 10-step scan, while the dispatch path measures 11.3 ms (batch 1) and the
batch sweep puts a batch-2 step at ~22 ms — so either scan compilation costs
the UNet ~2x, or the gap lives in the generate path (CFG structure, sampler
ops, layouts). This isolates the first question: same graph, same inputs,
batch 1, no sampler.

Usage: python tools/ab_scan_vs_dispatch.py [--steps N] [--iters M]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from onnxstream_tpu.utils.compile_cache import setup_repo_compile_cache  # noqa: E402

setup_repo_compile_cache()

import numpy as np


def main() -> None:
    steps = int(sys.argv[sys.argv.index("--steps") + 1]) if "--steps" in sys.argv else 25
    iters = int(sys.argv[sys.argv.index("--iters") + 1]) if "--iters" in sys.argv else 50

    import jax

    from onnxstream_tpu.models.sd.unet import build_unet, SD15
    from onnxstream_tpu.runtime.config import SessionConfig
    from onnxstream_tpu.runtime.session import Session
    from onnxstream_tpu.runtime.weights import DictWeightsProvider

    g = build_unet(SD15, batch=1, lazy_weights=True)
    s = Session(config=SessionConfig(compute_dtype="bfloat16",
                                     fuse_ops_in_attention=True,
                                     use_flash_attention=True),
                weights_provider=DictWeightsProvider(g.weights))
    s.read_string(g.to_text())
    rng = np.random.RandomState(0)
    inputs = {
        "sample": rng.rand(1, 4, 64, 64).astype(np.float32),
        "timestep": np.array([500.0], np.float32),
        "encoder_hidden_states": rng.rand(1, 77, 768).astype(np.float32),
    }
    for k, v in inputs.items():
        s.add_tensor(k, v)
    ex = s._executor()
    seg = ex.segments[0]
    weights = ex.synthesize_segment_weights(seg, min_bytes=1 << 20)
    acts = {k: jax.device_put(np.asarray(v, np.float32)) for k, v in inputs.items()}
    cf = ex._compiled(0)  # dispatch-path program (AUTO layouts if eligible)
    print("# dispatch program ready", file=sys.stderr, flush=True)

    # (a) dispatch loop
    r = cf(weights, acts)
    a = dict(acts)
    a["sample"] = r["out_sample"]
    r = cf(weights, a)
    np.asarray(r["out_sample"])  # warm + force
    t0 = time.time()
    for _ in range(iters):
        r = cf(weights, a)
        a["sample"] = r["out_sample"]
    np.asarray(r["out_sample"])
    disp_ms = (time.time() - t0) / iters * 1e3
    print(json.dumps({"variant": "dispatch_loop", "step_ms": round(disp_ms, 2),
                      "iters": iters}), flush=True)

    # (b) one jitted scan of the same body (default layouts, like the
    # generate_on_device path's with_formats=False fetch)
    import jax.numpy as jnp

    fn = ex._segment_fn(0)
    w2 = ex._fetch_segment_weights(seg, with_formats=False)

    # carry dtype must match the body output (bf16 compute): same feedback
    # signature as the dispatch loop's second warmup call
    o0 = jax.eval_shape(lambda w_, a_: fn(w_, a_), w2, acts)["out_sample"]

    @jax.jit
    def chain(w, a0):
        def step(sample, _):
            o = fn(w, {**a0, "sample": sample})
            return o["out_sample"], jnp.float32(0)
        out, _ = jax.lax.scan(step, jnp.asarray(a0["sample"], o0.dtype),
                              None, length=steps)
        return out

    print("# compiling scan...", file=sys.stderr, flush=True)
    np.asarray(chain(w2, acts)[(0, 0, 0, 0)])  # compile + warm + force
    t0 = time.time()
    out = chain(w2, acts)
    np.asarray(out[(0, 0, 0, 0)])
    scan_ms = (time.time() - t0) / steps * 1e3
    print(json.dumps({"variant": "scan", "step_ms": round(scan_ms, 2),
                      "steps": steps}), flush=True)
    s.close()


if __name__ == "__main__":
    main()
