"""UNet step profiling/ablation harness (perf work, not a benchmark).

Decomposes the SD1.5 UNet step time on the real chip by A/B ablation —
each variant builds the same 860M-param graph with one knob changed, then
times chained device-resident steps per docs/tpu_notes.md (forced warmup
readback, n chained steps, one forcing readback at the end):

  base        current production config (bf16, flash attention per-shape)
  noflash     use_flash_attention=False (all-XLA attention)
  noattn      attn_levels all False — conv/resnet-only UNet (isolates the
              conv+norm share; params differ, FLOPs of convs identical)
  f32norm     (reserved for experiments)

Optionally dumps the optimized HLO of the compiled step for fusion/transpose
inspection (--hlo PATH), and tries jax.profiler tracing (--trace DIR).

Usage: python tools/profile_unet.py [variants...] [--iters N] [--hlo out.txt]
"""

import dataclasses
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ostpu_jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(variant: str, batch: int = 1):
    import jax

    from onnxstream_tpu.models.sd.unet import build_unet, SD15
    from onnxstream_tpu.runtime.config import SessionConfig
    from onnxstream_tpu.runtime.session import Session
    from onnxstream_tpu.runtime.weights import DictWeightsProvider

    cfg = SD15
    if variant == "noattn":
        cfg = dataclasses.replace(SD15, attn_levels=(False,) * 4, transformer_layers=(0,) * 4)
    g = build_unet(cfg, batch=batch)
    config = SessionConfig(
        compute_dtype="bfloat16",
        fuse_ops_in_attention=True,
        use_flash_attention=(variant != "noflash"),
        auto_weight_layouts=("noauto" not in variant),
        use_dot_convs=("dotconv" in variant and "nodotconv" not in variant),
        use_rowdot_convs=("rowdot" in variant),
        fuse_attention_heads=("nopacked" not in variant),
    )
    s = Session(config=config, weights_provider=DictWeightsProvider(g.weights))
    s.read_string(g.to_text())
    rng = np.random.RandomState(0)
    inputs = {
        "sample": rng.rand(batch, 4, 64, 64).astype(np.float32),
        "timestep": np.array([500.0], np.float32),
        "encoder_hidden_states": rng.rand(batch, 77, 768).astype(np.float32),
    }
    for k, v in inputs.items():
        s.add_tensor(k, v)
    return s, inputs


def time_variant(variant: str, iters: int, hlo_path: str = "", trace_dir: str = "", batch: int = 1):
    import jax

    t0 = time.time()
    s, inputs = build(variant, batch=batch)
    ex = s._executor()
    seg = ex.segments[0]
    out_name = "out_sample" if "out_sample" in seg.out_names else seg.out_names[0]
    weights = ex._fetch_segment_weights(seg)
    acts = {k: jax.device_put(np.asarray(v, np.float32)) for k, v in inputs.items()}
    cf = ex._compiled(0)
    r = cf(weights, acts)
    a = dict(acts)
    a["sample"] = r[out_name]
    r = cf(weights, a)
    np.asarray(r[out_name], np.float32)  # force warmup
    setup_s = time.time() - t0

    if hlo_path:
        lowered = jax.jit(ex._segment_fn(0)).lower(weights, a)
        compiled = lowered.compile()
        with open(hlo_path, "w") as f:
            f.write(compiled.as_text())
        print(f"# wrote optimized HLO to {hlo_path}", file=sys.stderr)

    if trace_dir:
        try:
            with jax.profiler.trace(trace_dir):
                for _ in range(5):
                    r = cf(weights, a)
                    a["sample"] = r[out_name]
                np.asarray(r[out_name])
            print(f"# wrote profiler trace to {trace_dir}", file=sys.stderr)
        except Exception as e:
            print(f"# profiler trace failed: {e}", file=sys.stderr)

    t0 = time.time()
    for _ in range(iters):
        r = cf(weights, a)
        a["sample"] = r[out_name]
    np.asarray(r[out_name])
    dt_ms = (time.time() - t0) / iters * 1e3
    print(json.dumps({"variant": variant, "batch": batch, "step_ms": round(dt_ms, 2),
                      "setup_s": round(setup_s, 0)}), flush=True)
    s.close()
    return dt_ms


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    iters = 100
    hlo = ""
    trace = ""
    batch = 1
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--iters":
            iters = int(argv[i + 1])
        if a == "--hlo":
            hlo = argv[i + 1]
        if a == "--trace":
            trace = argv[i + 1]
        if a == "--batch":
            batch = int(argv[i + 1])
    variants = [a for a in args if a not in (str(iters), hlo, trace, str(batch))] or ["base"]
    for v in variants:
        time_variant(v, iters, hlo_path=hlo if v == variants[0] else "",
                     trace_dir=trace if v == variants[0] else "", batch=batch)


if __name__ == "__main__":
    main()
