"""Pallas TPU kernels for the hot ops (flash SDPA, W8A8 matmul)."""
