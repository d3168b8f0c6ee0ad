"""Real-architecture SD1.5 UNet (reduced width) through the converter.

The 860M full-width run is tools/fullsize_converter_proof.py (TPU, ~10 min);
this slow-tier test runs the IDENTICAL architecture and op mix at width 0.1
(~16M params) so every structural feature of the real UNet — 4 resolution
levels, 2+1 resnets, depth-1 spatial transformers with GEGLU, skip-concat
up path, sinusoidal time embedding — passes through torch.onnx.export ->
onnx2txt -> session runtime against the torch oracle on every CI run.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

pytestmark = pytest.mark.slow


def test_fullarch_unet_converted_forward_matches_torch(tmp_path):
    from torch_sd_unet import SDUNet, export_onnx, param_count

    from onnxstream_tpu.convert.onnx2txt import convert, mangle_name
    from onnxstream_tpu.runtime.session import Session

    torch.manual_seed(0)
    model = SDUNet(width=0.1).eval()
    assert param_count(model) > 5e6
    lat, ctx_len = 16, 12
    onnx_bytes = export_onnx(model, lat=lat, ctx_len=ctx_len)
    out_dir = str(tmp_path / "unet_fp32")
    convert(onnx_bytes, out_dir)

    rng = np.random.RandomState(1)
    sample = rng.randn(1, 4, lat, lat).astype(np.float32)
    t = np.array([500.0], np.float32)
    ctx = rng.randn(1, ctx_len, 768).astype(np.float32)

    s = Session(weights_provider_name="ram+prefetch")
    s.read_file(os.path.join(out_dir, "model.txt"))
    s.add_tensor(mangle_name("sample"), sample)
    s.add_tensor(mangle_name("timestep"), t)
    s.add_tensor(mangle_name("encoder_hidden_states"), ctx)
    ours = np.asarray(s.run()[mangle_name("out_sample")], np.float32)

    with torch.no_grad():
        ref = model(torch.tensor(sample), torch.tensor(t), torch.tensor(ctx)).numpy()
    max_dist = np.abs(ours - ref).max()
    assert max_dist < 2e-3 * max(1.0, np.abs(ref).max()), max_dist
    # the real op mix actually crossed the converter: spatial transformers
    # (Split from GEGLU chunk), Resize upsampling, InstanceNorm from GN
    types = {op.op_type for op in s.graph.ops}
    for t_ in ("Conv", "MatMul", "Softmax", "InstanceNormalization", "Resize", "Slice", "Erf"):
        assert t_ in types, (t_, sorted(types))
