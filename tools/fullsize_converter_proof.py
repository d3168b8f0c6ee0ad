"""Full-scale converter proof: the REAL-architecture 860M SD1.5 UNet through
torch.onnx.export -> convert/onnx2txt.py -> one session forward on the TPU,
compared against the torch oracle (print_max_dist, reference
src/sd.cpp:860-876).

This closes the \"converters only proven on toy shapes\" gap as far as the
no-network environment allows (reference equivalent: onnx2txt.ipynb driving
the downloaded checkpoint): random weights, exact architecture, full 64x64
latent resolution and 77-token context.

Prints one JSON line: {params_m, ops, max_dist, rel, forward_ms}.
"""

import json
import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ostpu_jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main() -> None:
    import torch

    from torch_sd_unet import SDUNet, export_onnx, param_count

    width = float(os.environ.get("OSTPU_PROOF_WIDTH", "1.0"))
    t0 = time.time()
    torch.manual_seed(0)
    model = SDUNet(width=width).eval()
    pm = param_count(model) / 1e6
    print(f"# model built: {pm:.1f}M params t+{time.time()-t0:.0f}s", file=sys.stderr, flush=True)

    onnx_bytes = export_onnx(model)
    print(f"# exported {len(onnx_bytes)/1e9:.2f} GB onnx t+{time.time()-t0:.0f}s",
          file=sys.stderr, flush=True)

    from onnxstream_tpu.convert.onnx2txt import convert, mangle_name

    out_dir = os.path.join(tempfile.mkdtemp(prefix="sd15_proof_"), "unet_fp32")
    convert(onnx_bytes, out_dir)
    del onnx_bytes
    print(f"# converted t+{time.time()-t0:.0f}s", file=sys.stderr, flush=True)

    rng = np.random.RandomState(1)
    sample = rng.randn(1, 4, 64, 64).astype(np.float32)
    t = np.array([500.0], np.float32)
    ctx = rng.randn(1, 77, 768).astype(np.float32)

    with torch.no_grad():
        ref = model(torch.tensor(sample), torch.tensor(t), torch.tensor(ctx)).numpy()
    del model
    print(f"# torch oracle done t+{time.time()-t0:.0f}s", file=sys.stderr, flush=True)

    from onnxstream_tpu.runtime.config import SessionConfig
    from onnxstream_tpu.runtime.session import Session

    s = Session(config=SessionConfig(compute_dtype="float32"),
                weights_provider_name="ram+prefetch")
    s.read_file(os.path.join(out_dir, "model.txt"))
    s.add_tensor(mangle_name("sample"), sample)
    s.add_tensor(mangle_name("timestep"), t)
    s.add_tensor(mangle_name("encoder_hidden_states"), ctx)
    ours = np.asarray(s.run()[mangle_name("out_sample")], np.float32)
    t1 = time.time()
    s.clear_tensors()
    s.add_tensor(mangle_name("sample"), sample)
    s.add_tensor(mangle_name("timestep"), t)
    s.add_tensor(mangle_name("encoder_hidden_states"), ctx)
    ours2 = np.asarray(s.run()[mangle_name("out_sample")], np.float32)
    fwd_ms = (time.time() - t1) * 1e3
    assert np.array_equal(ours, ours2)

    max_dist = float(np.abs(ours - ref).max())
    rel = max_dist / max(1e-9, float(np.abs(ref).max()))
    print(json.dumps({
        "metric": "fullsize_converter_proof",
        "params_m": round(pm, 1),
        "ops": len(s.graph.ops),
        "max_dist": round(max_dist, 6),
        "rel": round(rel, 6),
        "forward_ms": round(fwd_ms, 1),
        "ok": bool(rel < 5e-3),
    }), flush=True)


if __name__ == "__main__":
    main()
