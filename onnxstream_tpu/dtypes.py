"""Data types and name (de)mangling for the model.txt text IR.

The reference supports four wire dtypes (src/onnxstream.h:147-158): uint8 (with
per-tensor scale/zero-point), float16, float32 and int64.  We add bfloat16 —
the TPU-native 16-bit float — plus int8/int32/bool which appear as intermediate
compute types (the reference stores bool/int32 results in int64/float tensors;
we keep them first-class internally but serialize to the reference dtypes).

Name mangling matches the converter and bindings (reference src/bindings.py:309-329
and onnx2txt/onnx2txt.ipynb): every non-alphanumeric char c becomes "_%X_" % ord(c).
"""

from __future__ import annotations

import enum
import re

import numpy as np

try:  # jnp dtypes are only needed on the device path
    import jax.numpy as jnp

    _BFLOAT16 = jnp.bfloat16
except Exception:  # pragma: no cover - jax is a hard dep in practice
    jnp = None
    _BFLOAT16 = None


class DType(enum.Enum):
    """Wire/compute data types.

    The `wire` members (uint8/float16/float32/int64) round-trip through
    model.txt exactly as the reference parses them
    (src/onnxstream.cpp:2568-2593).
    """

    none = "none"
    uint8 = "uint8"
    float16 = "float16"
    float32 = "float32"
    int64 = "int64"
    # TPU-native extensions (not part of the reference wire format):
    bfloat16 = "bfloat16"
    int8 = "int8"
    int32 = "int32"
    bool_ = "bool"

    @property
    def np(self) -> np.dtype:
        return _NP[self]

    @property
    def itemsize(self) -> int:
        return _ITEMSIZE[self]

    @property
    def is_float(self) -> bool:
        return self in (DType.float16, DType.float32, DType.bfloat16)

    @property
    def is_wire(self) -> bool:
        return self in (DType.uint8, DType.float16, DType.float32, DType.int64)

    @staticmethod
    def from_np(dt) -> "DType":
        dt = np.dtype(dt) if not (jnp is not None and dt == _BFLOAT16) else dt
        for k, v in _NP.items():
            if v == dt:
                return k
        raise ValueError(f"unsupported numpy dtype {dt!r}")


_NP = {
    DType.uint8: np.dtype(np.uint8),
    DType.float16: np.dtype(np.float16),
    DType.float32: np.dtype(np.float32),
    DType.int64: np.dtype(np.int64),
    DType.int8: np.dtype(np.int8),
    DType.int32: np.dtype(np.int32),
    DType.bool_: np.dtype(np.bool_),
}
if _BFLOAT16 is not None:
    _NP[DType.bfloat16] = np.dtype(_BFLOAT16)

_ITEMSIZE = {k: v.itemsize for k, v in _NP.items()}
_ITEMSIZE[DType.none] = 0


def mangle_name(name: str) -> str:
    """ONNX tensor name -> model.txt-safe name (reference src/bindings.py:310)."""
    out = []
    for ch in name:
        if ch.isalnum():
            out.append(ch)
        else:
            out.append(f"_{ord(ch):X}_")
    return "".join(out)


_DEMANGLE_RE = re.compile(r"_([0-9A-Fa-f]+)_")


def demangle_name(name: str) -> str:
    """Inverse of mangle_name (reference src/bindings.py:320-329)."""

    def repl(match: re.Match) -> str:
        try:
            return chr(int(match.group(1), 16))
        except (ValueError, TypeError, OverflowError):
            return match.group(0)

    return _DEMANGLE_RE.sub(repl, name)
