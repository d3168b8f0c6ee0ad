"""Multi-chip scaling: meshes, sharding rules, sharded train/infer steps.

The reference is strictly single-process/single-device (SURVEY.md section 2.4:
no DP/TP/PP/SP/EP, no communication backend). This package is the TPU-native
extension: jax.sharding Meshes with XLA collectives over ICI.
"""

from onnxstream_tpu.parallel.sharding import (
    make_mesh,
    shard_weight_spec,
    shard_weights,
    make_train_step,
)

__all__ = ["make_mesh", "shard_weight_spec", "shard_weights", "make_train_step"]
