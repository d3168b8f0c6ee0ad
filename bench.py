"""Headline benchmark: SD1.5 UNet denoising step on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference runs the SD1.5 UNet fp16 in 18.2 s per
run (best of 3, i7-8750H AVX2 + SSD streaming, README.md:134). The metric here
is the same model forward (860M params, 64x64 latents, 77-token context),
built in the framework's text IR, planned/compiled by the session runtime,
bf16 compute with Pallas flash attention, on one TPU v5e chip.
vs_baseline = reference_ms / our_ms (higher is better).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_UNET_MS = 18200.0


def main() -> None:
    t_setup = time.time()
    import jax

    from onnxstream_tpu.models.sd.unet import build_unet, SD15, param_count
    from onnxstream_tpu.runtime.config import SessionConfig
    from onnxstream_tpu.runtime.session import Session
    from onnxstream_tpu.runtime.weights import DictWeightsProvider

    g = build_unet(SD15)
    config = SessionConfig(
        compute_dtype="bfloat16",
        fuse_ops_in_attention=True,
        use_flash_attention=True,
    )
    s = Session(config=config, weights_provider=DictWeightsProvider(g.weights))
    s.read_string(g.to_text())

    rng = np.random.RandomState(0)
    inputs = {
        "sample": rng.rand(1, 4, 64, 64).astype(np.float32),
        "timestep": np.array([500.0], np.float32),
        "encoder_hidden_states": rng.rand(1, 77, 768).astype(np.float32),
    }
    for k, v in inputs.items():
        s.add_tensor(k, v)

    out = s.run()  # compile + weight upload
    setup_s = time.time() - t_setup

    # steady-state timing: chained device-resident steps (out_sample feeds the
    # next step's sample, like a real diffusion loop with device-side CFG) and
    # ONE final host fetch — per-step D2H would otherwise dominate on a
    # tunneled chip (~50 ms round trip) and measure the link, not the model.
    import jax

    ex = s._executor()
    seg = ex.segments[0]
    weights = ex._fetch_segment_weights(seg)  # device-resident after first run
    acts = {k: jax.device_put(np.asarray(v, np.float32)) for k, v in inputs.items()}
    cf = ex._compiled(0)
    out_name = "out_sample" if "out_sample" in seg.out_names else seg.out_names[0]
    r = cf(weights, acts)
    # warm the feedback signature (sample arrives in compute dtype)
    a = dict(acts)
    a["sample"] = r[out_name]
    r = cf(weights, a)
    jax.block_until_ready(r)

    n_iter = 30
    t0 = time.time()
    for _ in range(n_iter):
        r = cf(weights, a)
        a["sample"] = r[out_name]
    np.asarray(jax.device_get(r[out_name]))
    dt_ms = (time.time() - t0) / n_iter * 1e3

    result = {
        "metric": "sd15_unet_step_ms",
        "value": round(dt_ms, 2),
        "unit": "ms",
        "vs_baseline": round(BASELINE_UNET_MS / dt_ms, 1),
    }
    print(json.dumps(result))
    print(
        f"# setup {setup_s:.0f}s, params {param_count(g)/1e6:.0f}M, ops {len(g.ops)}, "
        f"backend {jax.default_backend()}, out {list(out)[0]} max|x|={float(np.abs(list(out.values())[0]).max()):.3f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
