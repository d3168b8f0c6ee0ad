"""Blockwise Pallas flash-attention kernel (TPU).

Subsumes the reference's attention slicing (src/onnxstream.cpp:6696-6928) and
fused SDPA (src/onnxstream.cpp:7767-7882): the (M, N) score matrix only ever
exists one (block_q, block_kv) tile at a time in VMEM, with the online-softmax
running max/denominator carried across KV blocks.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def flash_attention(
    q,
    k,
    v,
    mask=None,
    scale: Optional[float] = None,
    k_transposed: bool = False,
    causal: bool = False,
):
    """Flash SDPA. Falls back (NotImplementedError) for shapes the kernel does
    not yet tile; the caller uses the jnp reference path then."""
    raise NotImplementedError("pallas flash attention kernel lands in the kernels milestone")
