"""Generic SD1.5 UNet step A/B over SessionConfig variants (real chip).

Methodology per docs/tpu_notes.md: warmup forced by a readback, then n
chained device-resident steps ended by one readback. Big float weights are
device-synthesized (executor.synthesize_segment_weights, seed-stable across
variants so outputs stay comparable) — on the tunneled chip this cuts each
variant's setup from ~10 min of WAN upload to roughly the compile time.

Usage: python tools/ab_unet.py [variant ...]   (default: all)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from onnxstream_tpu.utils.compile_cache import setup_repo_compile_cache  # noqa: E402

setup_repo_compile_cache()

import numpy as np

VARIANTS = {
    "base": {},
    "smallconv": {"use_pallas_smallconv": True},
    "smallconv_batch2": {"use_pallas_smallconv": True, "_batch": 2},
    "base_batch2": {"_batch": 2},
    "base_batch4": {"_batch": 4},
    "base_batch8": {"_batch": 8},
    "gnconv": {"fuse_gn_conv": True},
    "gnconv_batch2": {"fuse_gn_conv": True, "_batch": 2},
    # route non-lane-aligned packed attention through the unpadded
    # head-major kernel (VERDICT r3 #5: d=40 pads to 128 lanes = 3.2x-sized
    # HBM copies of Q/K/V in the packed path)
    "nopad_packed": {"flash_packed_nopad": True},
    # taller flash q-tile (the one lever that won on SDXL's 4k/16k
    # sequences: fewer grid rows ⇒ fewer k/v re-reads per row; bn>1024
    # clamps back to 1024 under the kernel's 12 MB VMEM budget, so
    # block_m is the whole effective change)
    "bm1024": {"flash_block_m": 1024},
    # calibrated-W8A8 path (VERDICT r3 #3): big Conv/MatMul weights marked
    # uint8 in the text IR (data-free, device-synthesized u8), synthetic
    # per-op activation ranges, Pallas qconv/qmatmul on the int8 MXU (2x bf16
    # peak on v5e). Timing-only: scale/zp values don't change the program.
    "w8a8": {"_w8a8": True},
    "w8a8_batch2": {"_w8a8": True, "_batch": 2},
}


def main() -> None:
    sel = [a for a in sys.argv[1:] if not a.startswith("-")] or list(VARIANTS)
    tiny = "--tiny" in sys.argv  # wiring smoke test (CPU-friendly sizes)
    n_iter = int(os.environ.get("OSTPU_SWEEP_ITERS", "50"))

    import jax

    from onnxstream_tpu.models.sd.unet import build_unet, SD15, TINY
    from onnxstream_tpu.runtime.config import SessionConfig
    from onnxstream_tpu.runtime.session import Session
    from onnxstream_tpu.runtime.weights import DictWeightsProvider

    ucfg0 = TINY if tiny else SD15
    built = {}  # batch -> (GraphBuilder, text): batch is baked into the IR

    def _graph(batch):
        if batch not in built:
            gb = build_unet(ucfg0, batch=batch, lazy_weights=True)
            built[batch] = (gb, gb.to_text())
        return built[batch]

    g, text = _graph(1)
    qtexts = {}  # batch -> (qtext, qranges)
    rng = np.random.RandomState(0)
    ref_out = {}
    for name in sel:
        cfg_kw = dict(VARIANTS[name])
        batch = cfg_kw.pop("_batch", 1)
        w8a8 = cfg_kw.pop("_w8a8", False)
        g, text = _graph(batch)
        # the mark threshold MUST equal the synthesis gate (min_bytes // 4,
        # f32-source elements): a u8-marked weight below the synth gate would
        # fall into the host-fetch path, whose provider only has f32 data
        synth_min_bytes = (1 << 10) if tiny else (1 << 20)
        if w8a8 and batch not in qtexts:
            from onnxstream_tpu.convert.quantize import mark_weights_uint8
            from onnxstream_tpu.ir import parse_model_txt

            # only weights big enough to device-synthesize get marked (the
            # provider is never asked for u8 data it doesn't have)
            qt, marked = mark_weights_uint8(
                text, {k: v.shape for k, v in g.weights.items()},
                min_elements=synth_min_bytes // 4,
            )
            qtexts[batch] = (qt, {op.name: (-4.0, 4.0)
                                  for op in parse_model_txt(qt).ops})
            print(f"# w8a8: {len(marked)} weights marked uint8",
                  file=sys.stderr, flush=True)
        qtext, qranges = qtexts.get(batch, (None, None))
        ucfg = TINY if tiny else SD15
        inputs = {
            "sample": rng.rand(
                batch, ucfg.in_channels, ucfg.sample_size, ucfg.sample_size
            ).astype(np.float32),
            "timestep": np.array([500.0], np.float32),
            "encoder_hidden_states": rng.rand(
                batch, ucfg.context_len, ucfg.cross_attention_dim
            ).astype(np.float32),
        }
        t0 = time.time()

        def _mark(stage):
            print(f"# {name} {stage} t+{time.time() - t0:.0f}s",
                  file=sys.stderr, flush=True)

        config = SessionConfig(
            compute_dtype="bfloat16",
            fuse_ops_in_attention=True,
            use_flash_attention=True,
            use_uint8_arithmetic=w8a8,
            range_data=dict(qranges) if w8a8 else {},
            **cfg_kw,
        )
        s = Session(config=config, weights_provider=DictWeightsProvider(g.weights))
        s.read_string(qtext if w8a8 else text)
        for k, v in inputs.items():
            s.add_tensor(k, v)
        ex = s._executor()
        _mark("session+plan")
        seg = ex.segments[0]
        out_name = "out_sample" if "out_sample" in seg.out_names else seg.out_names[0]
        weights = ex.synthesize_segment_weights(seg, min_bytes=synth_min_bytes)
        _mark("weights synthesized (dispatched)")
        acts = {k: jax.device_put(np.asarray(v, np.float32)) for k, v in inputs.items()}
        cf = ex._compiled(0)
        _mark("compiled")
        r = cf(weights, acts)
        a = dict(acts)
        a["sample"] = r[out_name]
        r = cf(weights, a)
        probe = np.asarray(r[out_name], np.float32)
        setup_s = time.time() - t0
        if batch not in ref_out:
            ref_out[batch] = probe
        t0 = time.time()
        for _ in range(n_iter):
            r = cf(weights, a)
            a["sample"] = r[out_name]
        np.asarray(r[out_name])
        dt_ms = (time.time() - t0) / n_iter * 1e3
        print(
            json.dumps(
                {
                    "variant": name,
                    "batch": batch,
                    "step_ms": round(dt_ms, 2),
                    "setup_s": round(setup_s, 0),
                    "graph_ops": len(s.graph.ops),
                    "max_dev_vs_first": round(
                        float(np.abs(probe - ref_out[batch]).max()), 4
                    ),
                }
            ),
            flush=True,
        )
        s.close()
        del weights, acts, r, a, cf, ex, s


if __name__ == "__main__":
    main()
