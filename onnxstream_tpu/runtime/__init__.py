"""Runtime: session, planner, executor, weights streaming, quantization."""
