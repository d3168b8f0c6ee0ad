"""A/B sweep of XLA TPU backend options on the SD1.5 UNet step.

The round-2 analysis (docs/tpu_notes.md) concluded the UNet's remaining
~11.5 ms/step is dominated by XLA's conv-fusion *schedule* (honest conv
fusions 6.3 ms at ~12% effective MFU) and that source-level rewrites lose —
the next lever is compiler scheduling flags. This tool times the SAME
compiled-session weights under candidate `compiler_options` sets (validated
against the backend: invalid names fail the compile loudly) and prints one
JSON line per config.

Usage:
    python tools/flag_sweep.py            # all candidate sets
    python tools/flag_sweep.py base vmem  # named subsets
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ostpu_jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CANDIDATES = {
    "base": {},
    "vmem64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem32m": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    "fusion_cost_model": {"xla_tpu_enable_experimental_fusion_cost_model": "true"},
    "bundle_cost_model": {"xla_tpu_use_bundle_aware_cost_model_for_fusions": "true"},
    "aggr_loop_fusion_layout": {"xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"},
    "multi_level_fusion": {"xla_tpu_enable_multi_level_nested_loop_fusion": "true"},
    "no_rwb_fusion": {"xla_tpu_rwb_fusion": "false"},
    "no_dot_strength_red": {"xla_tpu_enable_dot_strength_reduction": "false"},
    "dot_dot_fusion_dup": {"xla_tpu_dot_dot_fusion_duplicated": "true"},
    "latency_hiding": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    "vload_window": {"xla_tpu_vector_load_fusion_window": "2048",
                     "xla_tpu_vector_store_fusion_window": "512"},
    "scavenge_vmem": {"xla_tpu_scavenge_vmem_for_fusions": "true"},
    "flash_attention": {"xla_tpu_enable_flash_attention": "true"},
}


def main() -> None:
    sel = [a for a in sys.argv[1:] if not a.startswith("-")]
    names = sel or list(CANDIDATES)
    n_iter = int(os.environ.get("OSTPU_SWEEP_ITERS", "50"))

    import jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _build_session

    g, s, inputs = _build_session()
    ex = s._executor()
    seg = ex.segments[0]
    out_name = "out_sample" if "out_sample" in seg.out_names else seg.out_names[0]
    weights = ex._fetch_segment_weights(seg)
    acts = {k: jax.device_put(np.asarray(v, np.float32)) for k, v in inputs.items()}
    base_fn = ex._segment_fn(0)

    ref_out = None
    results = {}
    for name in names:
        opts = CANDIDATES[name]
        t0 = time.time()
        try:
            fn = jax.jit(base_fn, compiler_options=opts) if opts else jax.jit(base_fn)
            r = fn(weights, acts)
            a = dict(acts)
            a["sample"] = r[out_name]
            r = fn(weights, a)
            probe = np.asarray(r[out_name], np.float32)
            compile_s = time.time() - t0
            if ref_out is None:
                ref_out = probe
            t0 = time.time()
            for _ in range(n_iter):
                r = fn(weights, a)
                a["sample"] = r[out_name]
            np.asarray(r[out_name])
            dt_ms = (time.time() - t0) / n_iter * 1e3
            dev = float(np.abs(probe - ref_out).max()) if ref_out is not None else 0.0
            results[name] = dt_ms
            print(json.dumps({"config": name, "step_ms": round(dt_ms, 2),
                              "compile_s": round(compile_s, 1),
                              "max_dev_vs_base": round(dev, 4), "opts": opts}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"config": name, "error": str(e)[:200]}), flush=True)
    if results:
        best = min(results, key=results.get)
        print(json.dumps({"best": best, "step_ms": round(results[best], 2)}), flush=True)


if __name__ == "__main__":
    main()
