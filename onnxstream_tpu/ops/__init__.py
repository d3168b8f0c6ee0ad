"""Operator registry and evaluation context.

Each op implementation is a function ``impl(ctx, op, ins) -> [outputs]`` where
``ins`` holds ``None`` for absent optional inputs, numpy arrays for statically
known values, and JAX arrays/tracers for device values.

The registry replaces the reference's chain of ~43 ``if (op.m_type == ...)``
dispatch blocks (reference src/onnxstream.cpp:3859-8191) with a table, and the
``host`` flag marks ops the planner may fold on the CPU when every input is
statically known — the TPU-native answer to the reference's int64 shape-math
ops, which must never reach the XLA graph as dynamic values.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional

import numpy as np


class StaticRequired(Exception):
    """Raised by Ctx.static when an op needs input i as a host value.

    The planner catches this, loads the corresponding weight eagerly (pinning
    it host-side) and retries the op.
    """

    def __init__(self, index: int, what: str = ""):
        super().__init__(f"input {index} must be statically known ({what})")
        self.index = index
        self.what = what


@dataclasses.dataclass
class OpImpl:
    fn: Callable
    host: bool = False  # foldable on host (numpy) when all inputs are static


_REGISTRY: Dict[str, OpImpl] = {}


def register(op_type: str, host: bool = False):
    def deco(fn):
        _REGISTRY[op_type] = OpImpl(fn=fn, host=host)
        return fn

    return deco


def get_impl(op_type: str) -> OpImpl:
    impl = _REGISTRY.get(op_type)
    if impl is None:
        raise NotImplementedError(f"operator {op_type!r} is not implemented")
    return impl


def registered_ops() -> List[str]:
    return sorted(_REGISTRY)


class Ctx:
    """Per-evaluation context handed to op impls."""

    def __init__(self, xp, mode: str, config=None, op_name: str = ""):
        self.xp = xp  # numpy (host folding) or jax.numpy (device)
        self.mode = mode  # "host" | "device"
        self.config = config
        self.op_name = op_name

    # -- static value access -------------------------------------------------
    def static(self, ins, i: int, what: str = "") -> Optional[np.ndarray]:
        """Return input i as a concrete numpy array, or raise StaticRequired."""
        v = ins[i] if i < len(ins) else None
        if v is None:
            return None
        if isinstance(v, np.ndarray):
            return v
        if isinstance(v, (int, float, list, tuple)):
            return np.asarray(v)
        # jax concrete arrays can be realized; tracers cannot.
        try:
            import jax

            if isinstance(v, jax.Array):
                return np.asarray(v)
        except Exception:
            pass
        raise StaticRequired(i, what or self.op_name)

    # -- dtype helpers ---------------------------------------------------------
    @property
    def compute_dtype(self):
        if self.config is not None:
            return self.config.np_compute_dtype
        return np.float32

    def is_float(self, x) -> bool:
        return np.issubdtype(np.asarray(x).dtype if isinstance(x, np.ndarray) else x.dtype, np.floating) or str(
            x.dtype
        ) in ("bfloat16", "float16")


# Importing standard installs all builtin ops into the registry.
from onnxstream_tpu.ops import standard as _standard  # noqa: E402,F401
from onnxstream_tpu.ops import attention as _attention  # noqa: E402,F401
