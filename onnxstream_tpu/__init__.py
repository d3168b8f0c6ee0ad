"""onnxstream_tpu — a TPU-native inference framework with the capabilities of
vitoplantamura/OnnxStream, re-designed for JAX/XLA/Pallas.

The reference (https://github.com/vitoplantamura/OnnxStream) is a single-device
streaming ONNX interpreter (C++/XNNPACK).  This framework keeps its *contracts* —
the model.txt text IR (reference README.md:210-216), the WeightsProvider streaming
semantics (reference src/onnxstream.h:266-900), the quantization math
(src/onnxstream.cpp:2223-3479), and the application surfaces (sd/llm CLIs, C ABI,
bindings) — while executing as compiled XLA programs on TPU:

  * the graph is parsed into a typed IR, partially evaluated on the host
    (shape/index math stays on the CPU), and the floating-point dataflow is
    jitted into one XLA computation per *segment* (a streaming unit whose
    weights fit an HBM budget);
  * weights stream disk -> host -> HBM with an async double-buffered pipeline
    implementing the reference DiskPrefetch contract (src/onnxstream.h:356-664);
  * attention runs as a blockwise Pallas flash-attention kernel subsuming the
    reference's attention slicing (src/onnxstream.cpp:6696-6928) and fused SDPA
    (src/onnxstream.cpp:7767-7882);
  * multi-chip scaling uses jax.sharding Meshes and XLA collectives, a
    capability the reference does not have (SURVEY.md section 2.4).
"""

from onnxstream_tpu.dtypes import DType, mangle_name, demangle_name
from onnxstream_tpu.ir import TensorSpec, OpNode, Graph, parse_model_txt
from onnxstream_tpu.runtime.session import Session, SessionConfig

__version__ = "0.1.0"

__all__ = [
    "DType",
    "mangle_name",
    "demangle_name",
    "TensorSpec",
    "OpNode",
    "Graph",
    "parse_model_txt",
    "Session",
    "SessionConfig",
]
