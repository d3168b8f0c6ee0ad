"""CPU smoke for the bench enrichment-child harness (tools/measure.py).

The children normally run on the real chip inside bench.py; this exercises
the shared chained-step harness (sdxl_graph_and_inputs + chained_unet_time,
also used by tools/ab_sdxl.py) end-to-end on the tiny architecture so a
harness regression is caught in CI rather than on a bench hour.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_sdxl_child_tiny(monkeypatch):
    import measure

    monkeypatch.setattr(measure, "TINY", True)
    r = measure.sdxl_bench_result(n_iter=2)
    assert r["metric"] == "sdxl_unet_step_ms"
    assert r["step_ms"] > 0
    assert r["graph_ops"] > 100
    assert r["weights"] == "synthetic-device"


def test_chained_unet_time_probe_is_deterministic(monkeypatch):
    """Two sessions over the same graph/inputs must produce bit-identical
    warm probes — the property the A/B sweeps' max_dev_vs_first relies on."""
    import numpy as np

    import measure
    from onnxstream_tpu.runtime.config import SessionConfig
    from onnxstream_tpu.runtime.session import Session
    from onnxstream_tpu.runtime.weights import DictWeightsProvider

    monkeypatch.setattr(measure, "TINY", True)
    _, g, inputs = measure.sdxl_graph_and_inputs(True)
    text = g.to_text()
    probes = []
    for _ in range(2):
        s = Session(config=SessionConfig(compute_dtype="bfloat16",
                                         fuse_ops_in_attention=True,
                                         use_flash_attention=True),
                    weights_provider=DictWeightsProvider(g.weights))
        s.read_string(text)
        for k, v in inputs.items():
            s.add_tensor(k, v)
        _, probe = measure.chained_unet_time(s, inputs, 1, 1 << 10)
        probes.append(probe)
        s.close()
    assert np.array_equal(probes[0], probes[1])
