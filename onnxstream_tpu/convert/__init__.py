"""Model-format tooling: the onnx2txt converter and the GraphBuilder DSL."""
