"""Post-hoc uint8 quantization of an already-converted text-IR graph.

The reference quantizes at conversion time (onnx2txt.ipynb quantize() with
per-(op,input) exclusions); this utility applies the same percentile
quantization + exclusion rules to a graph that is already in model.txt form —
the path used to produce a `vae_decoder_qu8`-style model from the fp32 one
without re-running the converter (reference ships the qu8 decoder as a
separate converted artifact, src/sd.cpp:1174-1256).
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional, Set, Tuple

import numpy as np

from onnxstream_tpu.dtypes import DType
from onnxstream_tpu.ir import Graph, parse_model_txt
from onnxstream_tpu.runtime.quantization import quantize_weight_percentile

# (op_type, input_index) never quantized — matches convert/onnx2txt._QUANT_EXCLUDED
QUANT_EXCLUDED: Set[Tuple[str, int]] = {
    ("Conv", 2),
    ("InstanceNormalization", 1),
    ("InstanceNormalization", 2),
    ("Resize", 2),
}


def quantize_graph_weights(
    text: str,
    weights: Dict[str, np.ndarray],
    min_elements: int = 256,
    exclude_names: Optional[Iterable[str]] = None,
) -> Tuple[str, Dict[str, np.ndarray]]:
    """Quantize every eligible float32 weight of a text-IR graph to uint8.

    Returns (new model text with `uint8[scale,zp]` dtype prefixes, new weight
    dict with the quantized arrays). Weights smaller than `min_elements`, the
    excluded (op_type, input_index) pairs, non-float weights, and
    `exclude_names` stay untouched. A weight consumed by several ops is
    quantized only if EVERY consuming position is eligible (the notebook
    quantizes per-initializer, with the same effect).
    """
    g: Graph = parse_model_txt(text)
    excl = set(exclude_names or ())

    eligible: Dict[str, bool] = {}
    for op in g.ops:
        for idx, t in enumerate(op.inputs):
            if not (t.is_weight and t.name):
                continue
            ok = (
                (op.op_type, idx) not in QUANT_EXCLUDED
                and t.dtype == DType.float32
                and t.name in weights
                and np.asarray(weights[t.name]).size >= min_elements
                and t.name not in excl
            )
            eligible[t.name] = eligible.get(t.name, True) and ok

    new_weights = dict(weights)
    qparams: Dict[str, Tuple[float, int]] = {}
    for name, ok in eligible.items():
        if not ok:
            continue
        q, scale, zero = quantize_weight_percentile(np.asarray(weights[name], np.float32))
        new_weights[name] = q
        qparams[name] = (scale, zero)

    for op in g.ops:
        for t in op.inputs:
            if t.is_weight and t.name in qparams:
                t.dtype = DType.uint8
                t.scale, t.zero_point = qparams[t.name]
    return g.to_text(), new_weights
