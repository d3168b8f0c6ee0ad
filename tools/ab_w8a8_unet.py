"""A/B: calibrated-W8A8 SD1.5 UNet step vs the bf16 baseline, same hour.

The one lever never tried against the 11.5 ms bf16 ceiling (VERDICT r3 #3):
v5e's int8 MXU peak is 2x bf16, ~6.3 ms of the step is conv fusions, and the
W8A8 Pallas kernels (kernels/qconv.py / qmatmul.py) are oracle-tested — but
no calibrated-int8 UNet step was ever timed. This harness times it.

Timing-only methodology (docs/tpu_notes.md): weights are device-synthesized
(SessionConfig.synthetic_device_weights with synthetic_min_elements lowered so
the uint8 weights synthesize too), activation ranges are fixed constants —
dense int8/bf16 step time is value-independent, and real calibration data
would change none of the executed programs. Accuracy of the W8A8 path is
covered separately (tests/test_unet_quant_parity.py, tests/test_qconv.py,
tests/test_qmatmul.py, tests/test_vae_quant_parity.py).

Runs A (bf16) / B (W8A8) / A again — the repeat guards against the tunnel
hour drifting under the measurement. Reference analog: the static-W8A8
Conv/MatMul path, /root/reference/src/onnxstream.cpp:4494-4689, 5790-5795.

Usage: python tools/ab_w8a8_unet.py [--iters N]
"""

import json
import os
import sys
import time

os.path.dirname  # keep import order: jax config must precede heavy imports
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".cache", "jax_bench"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from onnxstream_tpu.convert.quantize import QUANT_EXCLUDED
from onnxstream_tpu.dtypes import DType
from onnxstream_tpu.ir import parse_model_txt


def fake_quantize_text(text: str, weights) -> str:
    """Rewrite eligible float weight specs to `uint8[scale,zp]` WITHOUT
    quantizing the arrays (they are device-synthesized): same eligibility
    rules as convert/quantize.quantize_graph_weights, fixed fake qparams.
    Timing-valid; numerically meaningless."""
    g = parse_model_txt(text)
    eligible = {}
    for op in g.ops:
        for idx, t in enumerate(op.inputs):
            if not (t.is_weight and t.name):
                continue
            ok = (
                (op.op_type, idx) not in QUANT_EXCLUDED
                and t.dtype == DType.float32
                and t.name in weights
                and int(np.prod(weights[t.name].shape)) >= 256
            )
            eligible[t.name] = eligible.get(t.name, True) and ok
    for op in g.ops:
        for t in op.inputs:
            if t.is_weight and eligible.get(t.name):
                t.dtype = DType.uint8
                t.scale, t.zero_point = 0.003, 128
    return g.to_text()


def build_session(quantized: bool):
    from onnxstream_tpu.models.sd.unet import build_unet, SD15
    from onnxstream_tpu.runtime.config import SessionConfig
    from onnxstream_tpu.runtime.session import Session
    from onnxstream_tpu.runtime.weights import DictWeightsProvider

    g = build_unet(SD15)
    text = g.to_text()
    ranges = None
    if quantized:
        text = fake_quantize_text(text, g.weights)
        # every op gets a plausible activation range: _qlinear_mode requires
        # a calibrated range for the op to take the W8A8 path at all
        ranges = {op.name: (-6.0, 6.0) for op in g.ops}
    config = SessionConfig(
        compute_dtype="bfloat16",
        fuse_ops_in_attention=True,
        use_flash_attention=True,
        use_uint8_arithmetic=quantized,
        range_data=ranges or {},
        synthetic_device_weights=True,
        synthetic_min_elements=256,
    )
    s = Session(config=config, weights_provider=DictWeightsProvider(g.weights))
    s.read_string(text)
    rng = np.random.RandomState(0)
    inputs = {
        "sample": rng.rand(1, 4, 64, 64).astype(np.float32),
        "timestep": np.array([500.0], np.float32),
        "encoder_hidden_states": rng.rand(1, 77, 768).astype(np.float32),
    }
    for k, v in inputs.items():
        s.add_tensor(k, v)
    return s, inputs


def time_step(s, inputs, iters: int) -> float:
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
    t0 = time.time()
    for _ in range(iters):
        r = cf(weights, a)
        a["sample"] = r[out_name]
    np.asarray(r[out_name])
    return (time.time() - t0) / iters * 1e3


def main():
    iters = 50
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])

    t0 = time.time()
    s_a, inputs = build_session(quantized=False)
    bf16_ms = time_step(s_a, inputs, iters)
    print(f"# bf16 baseline {bf16_ms:.2f} ms (setup+measure {time.time()-t0:.0f}s)",
          file=sys.stderr, flush=True)
    s_a.close()

    t0 = time.time()
    s_b, inputs = build_session(quantized=True)
    ex = s_b._executor()
    fired_conv = sum(1 for op in ex.graph.ops if ex._qlinear_mode(op) == "conv")
    fired_mm = sum(1 for op in ex.graph.ops if ex._qlinear_mode(op) == "matmul")
    w8a8_ms = time_step(s_b, inputs, iters)
    print(f"# w8a8 {w8a8_ms:.2f} ms, fired conv={fired_conv} matmul={fired_mm} "
          f"(setup+measure {time.time()-t0:.0f}s)", file=sys.stderr, flush=True)
    s_b.close()

    s_a2, inputs = build_session(quantized=False)
    bf16_again_ms = time_step(s_a2, inputs, iters)
    s_a2.close()

    print(json.dumps({
        "metric": "sd15_unet_w8a8_ab",
        "bf16_ms": round(bf16_ms, 2),
        "w8a8_ms": round(w8a8_ms, 2),
        "bf16_again_ms": round(bf16_again_ms, 2),
        "speedup": round(bf16_ms / w8a8_ms, 3),
        "w8a8_conv_ops": fired_conv,
        "w8a8_matmul_ops": fired_mm,
        "iters": iters,
    }))


if __name__ == "__main__":
    main()
