"""A/B the fused GroupNorm+SiLU Pallas path on the SD1.5 UNet step.

Variants: decomposed (fuse_groupnorm off), fused (default), and fused with
the flag-sweep winner (xla_tpu_scoped_vmem_limit_kib=32768). Prints one JSON
line per variant. Methodology per docs/tpu_notes.md: warmup forced by a
readback, then n chained device-resident steps ended by one readback.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ostpu_jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

VARIANTS = [
    ("decomposed", {"fuse_groupnorm": False}, {}),
    ("gn_silu_fused", {"fuse_groupnorm": True}, {}),
    ("fused_vmem32m", {"fuse_groupnorm": True},
     {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
]


def main() -> None:
    sel = [a for a in sys.argv[1:] if not a.startswith("-")]
    n_iter = int(os.environ.get("OSTPU_SWEEP_ITERS", "50"))

    import jax

    from onnxstream_tpu.models.sd.unet import build_unet, SD15
    from onnxstream_tpu.runtime.config import SessionConfig
    from onnxstream_tpu.runtime.session import Session
    from onnxstream_tpu.runtime.weights import DictWeightsProvider

    g = build_unet(SD15)
    text = g.to_text()
    rng = np.random.RandomState(0)
    inputs = {
        "sample": rng.rand(1, 4, 64, 64).astype(np.float32),
        "timestep": np.array([500.0], np.float32),
        "encoder_hidden_states": rng.rand(1, 77, 768).astype(np.float32),
    }
    ref_out = None
    for name, cfg_kw, copts in VARIANTS:
        if sel and name not in sel:
            continue
        t0 = time.time()
        config = SessionConfig(
            compute_dtype="bfloat16",
            fuse_ops_in_attention=True,
            use_flash_attention=True,
            compiler_options=copts or None,
            **cfg_kw,
        )
        s = Session(config=config, weights_provider=DictWeightsProvider(g.weights))
        s.read_string(text)
        for k, v in inputs.items():
            s.add_tensor(k, v)
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
        probe = np.asarray(r[out_name], np.float32)
        setup_s = time.time() - t0
        if ref_out is None:
            ref_out = probe
        t0 = time.time()
        for _ in range(n_iter):
            r = cf(weights, a)
            a["sample"] = r[out_name]
        np.asarray(r[out_name])
        dt_ms = (time.time() - t0) / n_iter * 1e3
        n_gn = sum(1 for op in s.graph.ops if op.op_type == "ostpu.gn_silu")
        print(
            json.dumps(
                {
                    "variant": name,
                    "step_ms": round(dt_ms, 2),
                    "setup_s": round(setup_s, 0),
                    "gn_silu_ops": n_gn,
                    "graph_ops": len(s.graph.ops),
                    "max_dev_vs_first": round(float(np.abs(probe - ref_out).max()), 4),
                }
            ),
            flush=True,
        )
        s.close()
        del weights, acts, r, a, cf, ex, s


if __name__ == "__main__":
    main()
