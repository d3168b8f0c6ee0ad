"""Model zoo: architecture graphs built on the GraphBuilder DSL.

The reference runs these model families from HF-hosted converted ONNX graphs
(SD1.5/SDXL/Turbo: reference src/sd.cpp; TinyLlama/Mistral: src/llm.cpp;
Whisper/YOLOv8n: examples/). This zoo reconstructs the architectures in the
same text IR, so pipelines/tests/benchmarks run without downloads, and real
converted weights drop in by name-mapping.
"""
