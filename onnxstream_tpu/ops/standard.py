"""The standard operator library.

Implements every operator the reference dispatches on (the ~43 blocks in
reference src/onnxstream.cpp:3859-8191) with ONNX semantics, written against
``ctx.xp`` (numpy for host constant-folding, jax.numpy on the device path),
plus a handful of common extensions (Relu/Tanh/Exp/...) that cost nothing.

Unlike the reference — where each block hand-rolls multithreaded loops or
calls XNNPACK — these bodies are *traceable*: the executor stages them into a
single XLA computation where fusion, layout assignment and MXU tiling happen
automatically. Reductions and normalizations accumulate in float32 regardless
of the compute dtype (the TPU-native equivalent of the reference's
``m_requires_upcast`` hook, src/onnxstream.cpp:2847-2848).
"""

from __future__ import annotations

import math
from typing import Any, List, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from onnxstream_tpu.ops import Ctx, register

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

_FLOAT_ORDER = {"float16": 0, "bfloat16": 0, "float32": 1, "float64": 2}


def _dt(x) -> str:
    return str(x.dtype)


def _is_float(x) -> bool:
    return _dt(x) in _FLOAT_ORDER


def _is_static(x) -> bool:
    return isinstance(x, np.ndarray)


def _astype(xp, x, dtype):
    if xp is np:
        return np.asarray(x).astype(dtype)
    return jnp.asarray(x).astype(dtype)


def _align_binary(ctx: Ctx, a, b):
    """Align dtypes of two operands for an elementwise op.

    Policy: a static (host-constant) operand adopts the dtype of the traced
    one; two floats of different width promote to the wider; int+float
    promotes to the float dtype; bool+int promotes to the int dtype.
    """
    xp = ctx.xp
    da, db = _dt(a), _dt(b)
    if da == db:
        return a, b
    fa, fb = da in _FLOAT_ORDER, db in _FLOAT_ORDER
    if fa and fb:
        if _is_static(a) and not _is_static(b):
            return _astype(xp, a, b.dtype), b
        if _is_static(b) and not _is_static(a):
            return a, _astype(xp, b, a.dtype)
        if _FLOAT_ORDER[da] >= _FLOAT_ORDER[db]:
            return a, _astype(xp, b, a.dtype)
        return _astype(xp, a, b.dtype), b
    if fa and not fb:
        return a, _astype(xp, b, a.dtype)
    if fb and not fa:
        return _astype(xp, a, b.dtype), b
    # both integral / bool
    if da == "bool":
        return _astype(xp, a, b.dtype), b
    if db == "bool":
        return a, _astype(xp, b, a.dtype)
    wider = a.dtype if np.dtype(da).itemsize >= np.dtype(db).itemsize else b.dtype
    if xp is not np and np.dtype(wider) == np.int64:
        wider = np.dtype(np.int32)  # device integers are 32-bit
    return _astype(xp, a, wider), _astype(xp, b, wider)


def _binary(fn):
    def impl(ctx: Ctx, op, ins):
        a, b = _align_binary(ctx, ins[0], ins[1])
        return [fn(ctx.xp, a, b)]

    return impl


def _f32_island(ctx: Ctx, x, body):
    """Run `body` in float32 and cast back to x's dtype (if x is low-precision
    float). The XLA-native version of the reference's selective upcasting."""
    dt = x.dtype
    if _is_float(x) and _dt(x) != "float32":
        y = body(_astype(ctx.xp, x, np.float32))
        return _astype(ctx.xp, y, dt)
    return body(x)


# ---------------------------------------------------------------------------
# elementwise binary (reference blocks: Mul 3906, Add 5056, Sub 5394, Div 5605,
# Pow 5478, Less/Greater/Equal/And 7637)
# ---------------------------------------------------------------------------

# host=True: all binaries are host-foldable (shape math on int64)
register("Mul", host=True)(_binary(lambda xp, a, b: a * b))
register("Add", host=True)(_binary(lambda xp, a, b: a + b))
register("Sub", host=True)(_binary(lambda xp, a, b: a - b))
def _div(xp, a, b):
    if _is_float(a):
        return a / b
    # ONNX integer Div truncates toward zero (C semantics), numpy // floors.
    q = xp.abs(a) // xp.abs(b)
    return xp.where((a < 0) != (b < 0), -q, q).astype(a.dtype)


register("Div", host=True)(_binary(_div))
register("Less", host=True)(_binary(lambda xp, a, b: a < b))
register("Greater", host=True)(_binary(lambda xp, a, b: a > b))
register("Equal", host=True)(_binary(lambda xp, a, b: a == b))
register("And", host=True)(_binary(lambda xp, a, b: (a.astype(bool)) & (b.astype(bool))))
register("Or", host=True)(_binary(lambda xp, a, b: (a.astype(bool)) | (b.astype(bool))))
register("Min", host=True)(_binary(lambda xp, a, b: xp.minimum(a, b)))
register("Max", host=True)(_binary(lambda xp, a, b: xp.maximum(a, b)))


@register("Pow", host=True)
def _pow(ctx: Ctx, op, ins):
    a, b = ins
    if _is_float(a) and not _is_float(b):
        b = _astype(ctx.xp, b, a.dtype)
    a, b = _align_binary(ctx, a, b)
    return [ctx.xp.power(a, b)]


# ---------------------------------------------------------------------------
# elementwise unary (reference: Cos/Sin/Sqrt/Erf 4002, Sigmoid 4376, Neg 7475)
# ---------------------------------------------------------------------------


def _unary(fn, host_fn=None):
    def impl(ctx: Ctx, op, ins):
        x = ins[0]
        if ctx.xp is np:
            return [(host_fn or fn)(np, x)]
        return [fn(jnp, x)]

    return impl


register("Neg", host=True)(_unary(lambda xp, x: -x))
register("Sqrt", host=True)(_unary(lambda xp, x: xp.sqrt(x)))
register("Cos", host=True)(_unary(lambda xp, x: xp.cos(x)))
register("Sin", host=True)(_unary(lambda xp, x: xp.sin(x)))
register("Exp")(_unary(lambda xp, x: xp.exp(x)))
register("Log")(_unary(lambda xp, x: xp.log(x)))
register("Abs", host=True)(_unary(lambda xp, x: xp.abs(x)))
register("Tanh")(_unary(lambda xp, x: xp.tanh(x)))
register("Relu")(_unary(lambda xp, x: xp.maximum(x, _astype(xp, 0, x.dtype))))
register("Not", host=True)(_unary(lambda xp, x: ~(x.astype(bool))))
register("Identity", host=True)(_unary(lambda xp, x: x))
register("Floor", host=True)(_unary(lambda xp, x: xp.floor(x)))
register("Ceil", host=True)(_unary(lambda xp, x: xp.ceil(x)))


@register("Erf")
def _erf(ctx: Ctx, op, ins):
    return [_f32_island(ctx, ins[0], lambda x: lax.erf(x))]


@register("Sigmoid")
def _sigmoid(ctx: Ctx, op, ins):
    return [jax.nn.sigmoid(ins[0])]


@register("LeakyRelu")
def _leaky_relu(ctx: Ctx, op, ins):
    alpha = op.attr_float("alpha", 0.01)
    x = ins[0]
    return [jnp.where(x >= 0, x, x * jnp.asarray(alpha, x.dtype))]


@register("Gelu")
def _gelu(ctx: Ctx, op, ins):
    approx = op.attr("approximate", "none") == "tanh"
    return [_f32_island(ctx, ins[0], lambda x: jax.nn.gelu(x, approximate=approx))]


@register("HardSigmoid")
def _hard_sigmoid(ctx: Ctx, op, ins):
    alpha = op.attr_float("alpha", 0.2)
    beta = op.attr_float("beta", 0.5)
    x = ins[0]
    return [jnp.clip(x * jnp.asarray(alpha, x.dtype) + jnp.asarray(beta, x.dtype), 0, 1)]


@register("Clip")
def _clip(ctx: Ctx, op, ins):
    x = ins[0]
    lo = ins[1] if len(ins) > 1 and ins[1] is not None else None
    hi = ins[2] if len(ins) > 2 and ins[2] is not None else None
    if lo is not None:
        x = ctx.xp.maximum(x, _astype(ctx.xp, lo, x.dtype))
    if hi is not None:
        x = ctx.xp.minimum(x, _astype(ctx.xp, hi, x.dtype))
    return [x]


# ---------------------------------------------------------------------------
# shape manipulation (reference: Unsqueeze 3859, Reshape 4708, Squeeze 7425,
# Flatten 8149, Transpose 5176, Expand 7154)
# ---------------------------------------------------------------------------


def _axes_from(ctx: Ctx, op, ins, index: int, attr_name: str = "axes"):
    """axes come from an attr (opset<13) or a static int64 input (opset>=13)."""
    if attr_name in op.attrs:
        return list(op.attr_ints(attr_name))
    if len(ins) > index and ins[index] is not None:
        return [int(v) for v in ctx.static(ins, index, attr_name).reshape(-1)]
    return None


@register("Unsqueeze", host=True)
def _unsqueeze(ctx: Ctx, op, ins):
    x = ins[0]
    axes = _axes_from(ctx, op, ins, 1)
    out_rank = x.ndim + len(axes)
    axes = sorted(a % out_rank for a in axes)
    for a in axes:
        x = ctx.xp.expand_dims(x, a)
    return [x]


@register("Squeeze", host=True)
def _squeeze(ctx: Ctx, op, ins):
    x = ins[0]
    axes = _axes_from(ctx, op, ins, 1)
    if axes is None:
        return [ctx.xp.squeeze(x)]
    axes = tuple(a % x.ndim for a in axes)
    return [ctx.xp.squeeze(x, axis=axes)]


@register("Reshape", host=True)
def _reshape(ctx: Ctx, op, ins):
    x = ins[0]
    shape = [int(v) for v in ctx.static(ins, 1, "Reshape.shape").reshape(-1)]
    allowzero = op.attr_int("allowzero", 0)
    out = []
    for i, d in enumerate(shape):
        if d == 0 and not allowzero:
            out.append(x.shape[i])
        else:
            out.append(d)
    return [ctx.xp.reshape(x, out)]


@register("Flatten", host=True)
def _flatten(ctx: Ctx, op, ins):
    x = ins[0]
    axis = op.attr_int("axis", 1)
    if axis < 0:
        # spec: axis in [-r, r]; -1 means the LAST axis (r-1 after wrap),
        # not r — `% (ndim + 1)` sent -1 to r and flattened to (N, 1)
        axis += x.ndim
    if not 0 <= axis <= x.ndim:
        raise ValueError(f"Flatten: axis {op.attr_int('axis', 1)} out of range for rank {x.ndim}")
    lead = int(np.prod(x.shape[:axis])) if axis > 0 else 1
    return [ctx.xp.reshape(x, (lead, -1))]


@register("Transpose", host=True)
def _transpose(ctx: Ctx, op, ins):
    x = ins[0]
    perm = op.attr_ints("perm")
    if perm is None:
        perm = tuple(reversed(range(x.ndim)))
    return [ctx.xp.transpose(x, perm)]


@register("Expand", host=True)
def _expand(ctx: Ctx, op, ins):
    x = ins[0]
    shape = [int(v) for v in ctx.static(ins, 1, "Expand.shape").reshape(-1)]
    # ONNX Expand uses bidirectional broadcast: out dim = max(in, requested)
    rank = max(x.ndim, len(shape))
    in_shape = (1,) * (rank - x.ndim) + tuple(x.shape)
    shape = [1] * (rank - len(shape)) + shape
    target = tuple(max(a, b) for a, b in zip(in_shape, shape))
    return [ctx.xp.broadcast_to(ctx.xp.reshape(x, in_shape), target)]


@register("Concat", host=True)
def _concat(ctx: Ctx, op, ins):
    axis = op.attr_int("axis")
    vals = [v for v in ins if v is not None]
    # align dtypes pairwise against the first traced operand
    ref = next((v for v in vals if not _is_static(v)), vals[0])
    aligned = []
    for v in vals:
        if _dt(v) != _dt(ref):
            v, _ = _align_binary(ctx, v, ref)
        aligned.append(v)
    return [ctx.xp.concatenate(aligned, axis=axis)]


@register("Split", host=True)
def _split(ctx: Ctx, op, ins):
    x = ins[0]
    axis = op.attr_int("axis", 0) % x.ndim
    sizes = None
    if "split" in op.attrs:
        sizes = list(op.attr_ints("split"))
    elif len(ins) > 1 and ins[1] is not None:
        sizes = [int(v) for v in ctx.static(ins, 1, "Split.split").reshape(-1)]
    n_out = len(op.outputs)
    if sizes is None:
        d = x.shape[axis]
        base = -(-d // n_out)
        sizes = [base] * n_out
        sizes[-1] = d - base * (n_out - 1)
        if sizes[-1] < 0:
            # dim too small for n_out even chunks (e.g. 5 into 4): the
            # clamped slices would silently emit empty outputs; ORT rejects
            raise ValueError(
                f"Split: axis dim {d} cannot make {n_out} even chunks")
    outs = []
    off = 0
    for s in sizes:
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(off, off + s)
        outs.append(x[tuple(idx)])
        off += s
    return outs


@register("Slice", host=True)
def _slice(ctx: Ctx, op, ins):
    x = ins[0]
    starts = [int(v) for v in ctx.static(ins, 1, "Slice.starts").reshape(-1)]
    ends = [int(v) for v in ctx.static(ins, 2, "Slice.ends").reshape(-1)]
    axes = None
    if len(ins) > 3 and ins[3] is not None:
        axes = [int(v) for v in ctx.static(ins, 3, "Slice.axes").reshape(-1)]
    steps = None
    if len(ins) > 4 and ins[4] is not None:
        steps = [int(v) for v in ctx.static(ins, 4, "Slice.steps").reshape(-1)]
    if axes is None:
        axes = list(range(len(starts)))
    if steps is None:
        steps = [1] * len(starts)
    idx = [slice(None)] * x.ndim
    for st, en, ax, sp in zip(starts, ends, axes, steps):
        ax = ax % x.ndim
        # numpy slice semantics already clamp; INT64_MAX-style ends work as None
        dim = x.shape[ax]
        if st > dim:
            st = dim
        if en > dim:
            en = dim
        idx[ax] = slice(st, en, sp)
    return [x[tuple(idx)]]


# ---------------------------------------------------------------------------
# data movement / indexing (reference: Gather 6316, ScatterND 7939, Where 7034,
# Shape 7003, Trilu 7883)
# ---------------------------------------------------------------------------


@register("Gather", host=True)
def _gather(ctx: Ctx, op, ins):
    x, idx = ins[0], ins[1]
    axis = op.attr_int("axis", 0) % x.ndim
    dim = x.shape[axis]
    if _is_static(idx):
        idx = np.where(idx < 0, idx + dim, idx)
        if ctx.xp is np:
            return [np.take(x, idx, axis=axis)]
        return [jnp.take(x, jnp.asarray(idx), axis=axis)]
    idx = jnp.where(idx < 0, idx + dim, idx)
    return [jnp.take(x, idx, axis=axis)]


def _shape_slice(shape, op):
    """opset-15 start/end attrs: a [start:end) window of the shape vector,
    negative values wrapping on the rank (spec Shape-15)."""
    r = len(shape)
    start = op.attr_int("start", 0)
    end = op.attr_int("end", r)
    if start < 0:
        start += r
    if end < 0:
        end += r
    start = min(max(start, 0), r)
    end = min(max(end, 0), r)
    return shape[start:max(start, end)]


@register("Shape", host=True)
def _shape(ctx: Ctx, op, ins):
    # Special: the executor folds Shape from metadata even for traced inputs
    # (the fold applies the same start/end window).
    return [np.asarray(_shape_slice(np.shape(ins[0]), op), dtype=np.int64)]


@register("Where", host=True)
def _where(ctx: Ctx, op, ins):
    cond, a, b = ins
    if _dt(cond) != "bool":
        cond = cond.astype(bool)
    a, b = _align_binary(ctx, a, b)
    return [ctx.xp.where(cond, a, b)]


@register("Trilu", host=True)
def _trilu(ctx: Ctx, op, ins):
    x = ins[0]
    k = 0
    if len(ins) > 1 and ins[1] is not None:
        k = int(ctx.static(ins, 1, "Trilu.k").reshape(-1)[0])
    upper = op.attr_int("upper", 1)
    xp = ctx.xp
    if upper:
        return [xp.triu(x, k)]
    return [xp.tril(x, k)]


@register("ScatterND")
def _scatternd(ctx: Ctx, op, ins):
    data, indices, updates = ins
    depth = indices.shape[-1]
    idx_flat = jnp.reshape(indices, (-1, depth))
    upd_shape = (-1,) + tuple(data.shape[depth:])
    upd_flat = jnp.reshape(updates, upd_shape)
    idx_tuple = tuple(idx_flat[:, j] for j in range(depth))
    out = jnp.asarray(data).at[idx_tuple].set(upd_flat.astype(data.dtype))
    return [out]


@register("ConstantOfShape", host=True)
def _constant_of_shape(ctx: Ctx, op, ins):
    shape = [int(v) for v in ctx.static(ins, 0, "ConstantOfShape.shape").reshape(-1)]
    value = op.attr("value", "0")
    # Our converter serializes the value tensor with its dtype ("int64:0",
    # "float32:0.0"); honor that. A bare scalar (reference-converted models,
    # onnx2txt.ipynb TENSOR attr handling) always materializes float32 like
    # the reference (onnxstream.cpp:7579 std::stof) — never infer int from
    # the string's spelling.
    dtype, sep, scalar = value.partition(":")
    if sep and dtype in ("float32", "float16", "int64", "int32", "uint8", "bool"):
        dt = np.dtype(dtype)
        arr = np.full(shape, dt.type(float(scalar) if dt.kind == "f" else int(scalar)))
    else:
        arr = np.full(shape, float(value), dtype=np.float32)
    return [arr]


@register("Range", host=True)
def _range(ctx: Ctx, op, ins):
    start = ctx.static(ins, 0, "Range.start").reshape(-1)[0]
    limit = ctx.static(ins, 1, "Range.limit").reshape(-1)[0]
    delta = ctx.static(ins, 2, "Range.delta").reshape(-1)[0]
    return [np.arange(start, limit, delta)]


@register("Cast", host=True)
def _cast(ctx: Ctx, op, ins):
    to = op.attr_int("to")
    # ONNX TensorProto.DataType ids
    m = {1: np.float32, 2: np.uint8, 3: np.int8, 6: np.int32, 7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64}
    if to == 16:  # bfloat16
        import ml_dtypes

        dt = ml_dtypes.bfloat16
    else:
        if to not in m:
            raise NotImplementedError(f"Cast to={to} not supported")
        dt = m[to]
    if ctx.xp is not np and dt == np.int64:
        # device-side integers are int32 (TPU-native; int64 is host/wire only —
        # the executor widens fetched integer outputs back to int64)
        dt = np.int32
    x = ins[0]
    if _dt(x) != "bool" and dt == np.bool_:
        return [(x != _astype(ctx.xp, 0, x.dtype))]
    return [_astype(ctx.xp, x, dt)]


# ---------------------------------------------------------------------------
# reductions & normalization (reference: ReduceMean 5237,
# InstanceNormalization 4788, Softmax 5862, ArgMax 6930)
# ---------------------------------------------------------------------------


@register("ReduceMean", host=True)
def _reduce_mean(ctx: Ctx, op, ins):
    x = ins[0]
    axes = _axes_from(ctx, op, ins, 1)
    keepdims = bool(op.attr_int("keepdims", 1))
    ax = tuple(a % x.ndim for a in axes) if axes else None
    return [_f32_island(ctx, x, lambda v: ctx.xp.mean(v, axis=ax, keepdims=keepdims))]


@register("ReduceSum", host=True)
def _reduce_sum(ctx: Ctx, op, ins):
    x = ins[0]
    axes = _axes_from(ctx, op, ins, 1)
    keepdims = bool(op.attr_int("keepdims", 1))
    ax = tuple(a % x.ndim for a in axes) if axes else None
    return [_f32_island(ctx, x, lambda v: ctx.xp.sum(v, axis=ax, keepdims=keepdims))]


@register("ReduceMax", host=True)
def _reduce_max(ctx: Ctx, op, ins):
    x = ins[0]
    axes = _axes_from(ctx, op, ins, 1)
    keepdims = bool(op.attr_int("keepdims", 1))
    ax = tuple(a % x.ndim for a in axes) if axes else None
    return [ctx.xp.max(x, axis=ax, keepdims=keepdims)]


@register("Softmax")
def _softmax(ctx: Ctx, op, ins):
    x = ins[0]
    axis = op.attr_int("axis", -1)
    return [_f32_island(ctx, x, lambda v: jax.nn.softmax(v, axis=axis))]


@register("ArgMax", host=True)
def _argmax(ctx: Ctx, op, ins):
    x = ins[0]
    axis = op.attr_int("axis", 0)
    keepdims = bool(op.attr_int("keepdims", 1))
    select_last = bool(op.attr_int("select_last_index", 0))
    xp = ctx.xp
    if select_last:
        rev = xp.flip(x, axis=axis)
        idx = xp.argmax(rev, axis=axis)
        idx = x.shape[axis % x.ndim] - 1 - idx
    else:
        idx = xp.argmax(x, axis=axis)
    idx = _astype(xp, idx, np.int64 if xp is np else np.int32)
    if keepdims:
        idx = xp.expand_dims(idx, axis % x.ndim)
    return [idx]


@register("ostpu.gn_silu")
def _gn_silu_op(ctx: Ctx, op, ins):
    """Fused GroupNorm + per-channel affine + optional SiLU (NCHW), produced
    by runtime/fusion.fuse_groupnorm from the converter's Reshape ->
    InstanceNormalization -> Reshape -> Mul -> Add [-> Sigmoid+Mul] chain
    (the decomposition the reference executes op-by-op,
    src/onnxstream.cpp:4788). One-HBM-pass Pallas kernel on TPU
    (kernels/gn_silu.py); jnp oracle elsewhere."""
    x, sg, sb, gamma, beta = ins[0], ins[1], ins[2], ins[3], ins[4]
    groups = op.attr_int("groups")
    eps = op.attr_float("epsilon", 1e-5)
    silu = bool(op.attr_int("silu", 0))
    if ctx.xp is np:
        c = x.shape[1]
        xf = np.asarray(x, np.float32).reshape(x.shape[0], groups, -1)
        mean = xf.mean(axis=-1, keepdims=True)
        var = np.maximum((xf * xf).mean(axis=-1, keepdims=True) - mean * mean, 0.0)
        norm = (xf - mean) / np.sqrt(var + eps)
        norm = norm * np.asarray(sg, np.float32).reshape(1, groups, 1)
        norm = norm + np.asarray(sb, np.float32).reshape(1, groups, 1)
        y = norm.reshape(x.shape)
        y = y * np.asarray(gamma, np.float32).reshape(1, c, 1, 1)
        y = y + np.asarray(beta, np.float32).reshape(1, c, 1, 1)
        if silu:
            y = y * (1.0 / (1.0 + np.exp(-y)))
        return [y.astype(np.asarray(x).dtype)]
    from onnxstream_tpu.kernels.gn_silu import gn_silu

    return [
        gn_silu(
            jnp.asarray(x), jnp.asarray(sg), jnp.asarray(sb),
            jnp.asarray(gamma), jnp.asarray(beta),
            groups=groups, eps=eps, silu=silu,
            interpret=bool(getattr(ctx.config, "pallas_interpret", False)),
        )
    ]


@register("ostpu.gn_silu_conv")
def _gn_silu_conv_op(ctx: Ctx, op, ins):
    """Fused GroupNorm + affine + SiLU + Conv3x3 (s1 p1 g1), produced by
    runtime/fusion.fuse_gn_conv. One-HBM-pass Pallas kernel on TPU
    (kernels/gn_conv.py: taps formed by VMEM lane rolls, weight arrives in
    the (9, O, C) upload transform); jnp oracle elsewhere. Reference chain:
    InstanceNormalization + Mul/Add + Sigmoid/Mul + Conv executed op-by-op
    (src/onnxstream.cpp:4788, :4639)."""
    x, sg, sb, gamma, beta, w9 = ins[0], ins[1], ins[2], ins[3], ins[4], ins[5]
    bias = ins[6] if len(ins) > 6 else None
    groups = op.attr_int("groups")
    eps = op.attr_float("epsilon", 1e-5)
    from onnxstream_tpu.kernels.gn_conv import gn_silu_conv

    return [
        gn_silu_conv(
            jnp.asarray(x), jnp.asarray(sg), jnp.asarray(sb),
            jnp.asarray(gamma), jnp.asarray(beta), jnp.asarray(w9),
            None if bias is None else jnp.asarray(bias),
            groups=groups, eps=eps,
            interpret=bool(getattr(ctx.config, "pallas_interpret", False)),
        )
    ]


@register("InstanceNormalization")
def _instance_norm(ctx: Ctx, op, ins):
    x, scale, bias = ins
    eps = op.attr_float("epsilon", 1e-5)
    dt = x.dtype
    xf = x.astype(jnp.float32)
    red = tuple(range(2, x.ndim))
    # one-pass statistics: E[x] and E[x^2] reduce in the same fused read of x
    # (sequential mean->var costs a second full pass over the activation —
    # measured 0.75 ms/step of convert_reduce time on the SD1.5 UNet); both
    # moments accumulate in fp32 so the E[x^2]-E[x]^2 form stays accurate for
    # normalization-scale inputs
    mean = jnp.mean(xf, axis=red, keepdims=True)
    mean2 = jnp.mean(jnp.square(xf), axis=red, keepdims=True)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    norm = (xf - mean) * lax.rsqrt(var + eps)
    sh = (1, -1) + (1,) * (x.ndim - 2)
    out = norm * scale.astype(jnp.float32).reshape(sh) + bias.astype(jnp.float32).reshape(sh)
    return [out.astype(dt)]


@register("ostpu.groupnorm")
def _ostpu_groupnorm(ctx: Ctx, op, ins):
    """Channel-last GroupNorm — the fused form of the converter's
    Reshape(N,G,-1) > InstanceNormalization > Reshape decomposition
    (runtime/layout.py). Input (N,H,W,C); per-group scale/bias (G,) carry the
    InstanceNormalization affine params (ones/zeros in the converter's
    output, but honored exactly). Channels grouped contiguously, identical
    element sets to the NCHW cluster — only the reduction layout changes."""
    x, scale, bias = ins[0], ins[1], ins[2]
    g = op.attr_int("groups")
    eps = op.attr_float("epsilon", 1e-5)
    n, h, w, c = x.shape
    cg = c // g
    dt = x.dtype
    # Stats via per-CHANNEL sums first: the (hw, c) reduce keeps the large
    # channel dim in lanes (clean tiling); the group fold then runs on a tiny
    # (g, cg) vector. A direct (n,hw,g,cg) reduce puts cg (e.g. 10) in lanes
    # and measured 0.2 ms per reduction on the SD1.5 UNet.
    xf = x.astype(jnp.float32).reshape(n, h * w, c)
    s1 = jnp.sum(xf, axis=1)  # (n, c)
    s2 = jnp.sum(jnp.square(xf), axis=1)  # fused into the same read of x
    cnt = float(h * w * cg)
    mean = jnp.sum(s1.reshape(n, g, cg), axis=2) / cnt  # (n, g)
    mean2 = jnp.sum(s2.reshape(n, g, cg), axis=2) / cnt
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    inv = lax.rsqrt(var + eps) * scale.astype(jnp.float32)  # (n, g)
    shift = bias.astype(jnp.float32) - mean * inv
    mul_c = jnp.repeat(inv, cg, axis=1)[:, None, :]  # (n, 1, c)
    add_c = jnp.repeat(shift, cg, axis=1)[:, None, :]
    out = xf * mul_c + add_c
    return [out.reshape(n, h, w, c).astype(dt)]


@register("ostpu.reshape", host=True)
def _ostpu_reshape(ctx: Ctx, op, ins):
    """Attribute-shaped reshape (no shape-constant weight input): emitted by
    the layout pass where a Reshape target must change (runtime/layout.py)."""
    shape = [int(v) for v in op.attr("shape").split(",")]
    return [ctx.xp.reshape(ins[0], shape)]


@register("LayerNormalization")
def _layer_norm(ctx: Ctx, op, ins):
    x = ins[0]
    scale = ins[1]
    bias = ins[2] if len(ins) > 2 and ins[2] is not None else None
    axis = op.attr_int("axis", -1)
    eps = op.attr_float("epsilon", 1e-5)
    dt = x.dtype
    xf = x.astype(jnp.float32)
    red = tuple(range(axis % x.ndim, x.ndim))
    # one-pass E[x]/E[x^2] stats (see InstanceNormalization)
    mean = jnp.mean(xf, axis=red, keepdims=True)
    var = jnp.maximum(jnp.mean(jnp.square(xf), axis=red, keepdims=True) - jnp.square(mean), 0.0)
    out = (xf - mean) * lax.rsqrt(var + eps) * scale.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return [out.astype(dt)]


# ---------------------------------------------------------------------------
# matmul family (reference: MatMul 5669, Gemm 4300) — the MXU path.
# ---------------------------------------------------------------------------


def _matmul_dtype(ctx: Ctx, a, b):
    """Matmuls accumulate in float32 on the MXU regardless of operand dtype."""
    return jnp.float32 if _is_float(a) else None


def _mxu_precision(a):
    """float32 operands get true-fp32 MXU passes; bf16/fp16 use the fast path."""
    return lax.Precision.HIGHEST if _dt(a) == "float32" else None


@register("MatMul")
def _matmul(ctx: Ctx, op, ins):
    a, b = _align_binary(ctx, ins[0], ins[1])
    out = jnp.matmul(a, b, preferred_element_type=_matmul_dtype(ctx, a, b), precision=_mxu_precision(a))
    return [out.astype(a.dtype)]


@register("Gemm")
def _gemm(ctx: Ctx, op, ins):
    a, b = ins[0], ins[1]
    c = ins[2] if len(ins) > 2 and ins[2] is not None else None
    alpha = op.attr_float("alpha", 1.0)
    beta = op.attr_float("beta", 1.0)
    if op.attr_int("transA", 0):
        a = a.T
    if op.attr_int("transB", 0):
        b = b.T
    a, b = _align_binary(ctx, a, b)
    y = jnp.matmul(a, b, preferred_element_type=_matmul_dtype(ctx, a, b), precision=_mxu_precision(a)).astype(a.dtype)
    if alpha != 1.0:
        y = y * jnp.asarray(alpha, y.dtype)
    if c is not None:
        cc, _ = _align_binary(ctx, c, y)
        if beta != 1.0:
            cc = cc * jnp.asarray(beta, cc.dtype)
        y = y + cc
    return [y]


# ---------------------------------------------------------------------------
# convolution & pooling (reference: Conv 4494, MaxPool 8075)
# ---------------------------------------------------------------------------


def _conv_prefers_dot(x, w, strides, dilations) -> bool:
    """True where XLA's conv emitters are measured-slow on TPU and an
    explicit im2col+dot wins: tiny spatial outputs (<=8x8 — XLA picks a
    direct NCHW convolution at ~10% MFU there: 0.18 ms for the SD1.5
    mid-block 3x3 vs ~0.04 via the MXU) and tiny contraction dims (the
    conv_in case, C*Kh*Kw = 36)."""
    try:
        import jax

        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    n, c, h, wd = x.shape
    o, _, kh, kw = w.shape
    # conservative: the spatial size post-stride (pads only grow it)
    out_hw = max(1, (h // strides[0]) * (wd // strides[1]))
    k = c * kh * kw
    return out_hw <= 64 or k <= 64


def _conv_im2col_dot(ctx: Ctx, x, w, b, strides, pads, dilations):
    """Convolution as patch-extraction + one MXU dot (the quantized path's
    design, kernels/qconv.py, applied to the float path where XLA's own conv
    choice is slow). NCHW in/out."""
    n, c, h, wd = x.shape
    o, _, kh, kw = w.shape
    sh, sw = strides
    dh, dw = dilations
    pt, pl_, pb, pr = pads
    xp = jnp.pad(x, ((0, 0), (0, 0), (pt, pb), (pl_, pr)))
    hp, wp = h + pt + pb, wd + pl_ + pr
    ho = (hp - ((kh - 1) * dh + 1)) // sh + 1
    wo = (wp - ((kw - 1) * dw + 1)) // sw + 1
    cols = []
    for i in range(kh):
        for j in range(kw):
            cols.append(xp[:, :, i * dh : i * dh + (ho - 1) * sh + 1 : sh,
                           j * dw : j * dw + (wo - 1) * sw + 1 : sw])
    pat = jnp.stack(cols, axis=0).transpose(1, 3, 4, 2, 0)  # (N,Ho,Wo,C,KhKw)
    a2 = pat.reshape(n * ho * wo, c * kh * kw)
    w2 = w.reshape(o, -1).T  # (C*Kh*Kw, O); column order matches pat
    y = jnp.matmul(a2, w2, preferred_element_type=jnp.float32 if _is_float(x) else None,
                   precision=_mxu_precision(x)).astype(x.dtype)
    if b is not None:
        bb, _ = _align_binary(ctx, b, y)
        y = y + bb.reshape(1, -1)
    return y.reshape(n, ho, wo, o).transpose(0, 3, 1, 2)


def _conv_rowdot(ctx: Ctx, x, w, b):
    """3x3 stride-1 same-pad conv as three row-shifted MXU dots (NCHW io).

    Column im2col first: xw = concat of the three dx-shifted NHWC views
    -> (N, H, W, 3C). Zero-pad one row top/bottom and flatten to
    (N, (H+2)*W, 3C); each kernel row dy then contributes one dot of a
    *contiguous* slice a[:, dy*W : dy*W + H*W] with w[:, :, dy, :] laid out
    (3C, O) in dx-major row order. Exactly 2*HW*9C*O FLOPs — none of the
    redundant work of XLA's space-to-batch / dot->conv schedules on these
    shapes — and the only relayout is the single (HW, 3C) concat."""
    n, c, h, wd = x.shape
    o = w.shape[0]
    xt = jnp.transpose(x, (0, 2, 3, 1))  # (N,H,W,C)
    xp = jnp.pad(xt, ((0, 0), (0, 0), (1, 1), (0, 0)))
    xw = jnp.concatenate([xp[:, :, j : j + wd, :] for j in range(3)], axis=-1)
    a = jnp.pad(xw, ((0, 0), (1, 1), (0, 0), (0, 0))).reshape(n, (h + 2) * wd, 3 * c)
    acc = None
    for dy in range(3):
        # (kw, C, O): contraction rows dx-major to match the xw concat order
        w2 = jnp.transpose(w[:, :, dy, :], (2, 1, 0)).reshape(3 * c, o)
        yy = jnp.matmul(
            a[:, dy * wd : dy * wd + h * wd, :], w2,
            preferred_element_type=jnp.float32, precision=_mxu_precision(x),
        )
        acc = yy if acc is None else acc + yy
    if b is not None:
        acc = acc + b.astype(acc.dtype).reshape(1, 1, o)
    return acc.astype(x.dtype).reshape(n, h, wd, o).transpose(0, 3, 1, 2)


@register("Conv")
def _conv(ctx: Ctx, op, ins):
    x, w = ins[0], ins[1]
    b = ins[2] if len(ins) > 2 and ins[2] is not None else None

    conv1d = x.ndim == 3
    if conv1d:
        # the converter promotes Conv1D weights to (O,I,k,1)
        # (onnx2txt.ipynb Conv handling); promote the input to match.
        x = x[..., None]
        if w.ndim == 3:
            w = w[..., None]

    group = op.attr_int("group", 1)
    n_spatial = x.ndim - 2
    strides = list(op.attr_ints("strides", [1] * n_spatial))
    dilations = list(op.attr_ints("dilations", [1] * n_spatial))
    pads = list(op.attr_ints("pads", [0] * (2 * n_spatial)))
    if conv1d:
        strides = strides + [1] if len(strides) < 2 else strides
        dilations = dilations + [1] if len(dilations) < 2 else dilations
        if len(pads) == 2:
            pads = [pads[0], 0, pads[1], 0]
    padding = [(pads[i], pads[i + n_spatial]) for i in range(n_spatial)]

    x, w = _align_binary(ctx, x, w)
    # NHWC is the TPU-preferred conv layout (reference default too — XNNPACK
    # is NHWC, src/onnxstream.cpp:4494; use_nchw_convs opts into NCHW). The
    # logical transposes fuse into neighboring elementwise ops under XLA and
    # keep channel minor for the MXU (measured 93 vs 84 TF/s standalone on
    # the SD1.5 64x64 conv).
    nhwc = not (ctx.config is not None and getattr(ctx.config, "use_nchw_convs", False))
    conv_kw = dict(
        window_strides=strides,
        padding=padding,
        rhs_dilation=dilations,
        feature_group_count=group,
        preferred_element_type=jnp.float32 if _is_float(x) else None,
        precision=_mxu_precision(x),
    )
    if op.attr("layout") == "NHWC":
        # channel-last input/output (runtime/layout.py rewrite): no transposes
        dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "OIHW", "NHWC"))
        out = lax.conv_general_dilated(x, w, dimension_numbers=dn, **conv_kw).astype(x.dtype)
        if b is not None:
            bb, _ = _align_binary(ctx, b, out)
            out = out + bb.reshape((1,) + (1,) * n_spatial + (-1,))
        return [out]
    if (
        not conv1d
        and group == 1
        and x.ndim == 4
        and ctx.xp is jnp
        and _is_float(x)
        and getattr(ctx.config, "use_pallas_smallconv", False)
        and (jax.default_backend() == "tpu"
             or getattr(ctx.config, "pallas_interpret", False))
        and tuple(w.shape[2:]) == (3, 3)
        and strides == [1, 1]
        and dilations == [1, 1]
        and pads == [1, 1, 1, 1]
        and x.shape[1] % 128 == 0
        and w.shape[0] % 128 == 0
        and x.shape[2] * x.shape[3] <= 1024
        and (x.shape[0] * x.shape[2] * x.shape[3]) % 8 == 0
    ):
        # small-spatial 3x3 convs via im2col + the opaque Pallas MXU matmul
        # (kernels/matmul.py): XLA's direct schedule here is ~10-12% MFU and
        # rewrites any source-level dot formulation back into the same conv
        # (docs/tpu_notes.md); the Pallas call is immune to that rewrite.
        from onnxstream_tpu.kernels.matmul import conv3x3_im2col_pallas

        xt = jnp.transpose(x, (0, 2, 3, 1))
        bb = None
        if b is not None:
            bb, _ = _align_binary(ctx, b, x)
        y = conv3x3_im2col_pallas(
            xt, w, bb,
            interpret=getattr(ctx.config, "pallas_interpret", False),
        )
        return [jnp.transpose(y, (0, 3, 1, 2))]
    if (
        not conv1d
        and group == 1
        and x.ndim == 4
        and ctx.xp is jnp
        and _is_float(x)
        and getattr(ctx.config, "use_rowdot_convs", False)
        and tuple(w.shape[2:]) == (3, 3)
        and strides == [1, 1]
        and dilations == [1, 1]
        and pads == [1, 1, 1, 1]
        and x.shape[1] >= 32
    ):
        return [_conv_rowdot(ctx, x, w, b)]
    if (
        not conv1d
        and group == 1
        and x.ndim == 4
        and ctx.xp is jnp
        and _is_float(x)
        and (ctx.config is None or getattr(ctx.config, "use_dot_convs", True))
        and _conv_prefers_dot(x, w, strides, dilations)
    ):
        out = _conv_im2col_dot(ctx, x, w, b, strides, pads, dilations)
        return [out]
    if nhwc and x.ndim == 4:
        xt = jnp.transpose(x, (0, 2, 3, 1))
        dn = lax.conv_dimension_numbers(xt.shape, w.shape, ("NHWC", "OIHW", "NHWC"))
        out = lax.conv_general_dilated(xt, w, dimension_numbers=dn, **conv_kw).astype(x.dtype)
        if b is not None:
            bb, _ = _align_binary(ctx, b, out)
            out = out + bb.reshape((1,) + (1,) * n_spatial + (-1,))
        out = jnp.transpose(out, (0, 3, 1, 2))
    else:
        dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NCHW", "OIHW", "NCHW"))
        out = lax.conv_general_dilated(x, w, dimension_numbers=dn, **conv_kw).astype(x.dtype)
        if b is not None:
            bb, _ = _align_binary(ctx, b, out)
            out = out + bb.reshape((1, -1) + (1,) * n_spatial)
    if conv1d:
        out = out[..., 0]
    return [out]


@register("MaxPool")
def _maxpool(ctx: Ctx, op, ins):
    x = ins[0]
    kernel = list(op.attr_ints("kernel_shape"))
    n_spatial = len(kernel)
    strides = list(op.attr_ints("strides", [1] * n_spatial))
    pads = list(op.attr_ints("pads", [0] * (2 * n_spatial)))
    ceil_mode = op.attr_int("ceil_mode", 0)
    dilations = list(op.attr_ints("dilations", [1] * n_spatial))
    if any(d != 1 for d in dilations):
        raise NotImplementedError("MaxPool dilations != 1")

    spatial0 = 1 if op.attr("layout") == "NHWC" else 2
    padding = []
    for i in range(n_spatial):
        lo, hi = pads[i], pads[i + n_spatial]
        if ceil_mode:
            size = x.shape[spatial0 + i] + lo + hi
            out_dim = -(-(size - kernel[i]) // strides[i]) + 1
            needed = (out_dim - 1) * strides[i] + kernel[i] - size
            hi += max(0, needed)
        padding.append((lo, hi))

    neg_inf = jnp.asarray(-jnp.inf if _is_float(x) else jnp.iinfo(x.dtype).min, x.dtype)
    dims, strd, padd = _window_tuples(op, kernel, strides, padding)
    out = lax.reduce_window(x, neg_inf, lax.max, window_dimensions=dims,
                            window_strides=strd, padding=padd)
    return [out]


def _window_tuples(op, kernel, strides, padding):
    """Window spec for pooling: spatial dims sit at (2..) in NCHW and (1..)
    in channel-last (layout:NHWC, runtime/layout.py)."""
    if op.attr("layout") == "NHWC":
        return (
            (1,) + tuple(kernel) + (1,),
            (1,) + tuple(strides) + (1,),
            ((0, 0),) + tuple(padding) + ((0, 0),),
        )
    return (
        (1, 1) + tuple(kernel),
        (1, 1) + tuple(strides),
        ((0, 0), (0, 0)) + tuple(padding),
    )


@register("AveragePool")
def _avgpool(ctx: Ctx, op, ins):
    x = ins[0]
    kernel = list(op.attr_ints("kernel_shape"))
    n_spatial = len(kernel)
    strides = list(op.attr_ints("strides", [1] * n_spatial))
    pads = list(op.attr_ints("pads", [0] * (2 * n_spatial)))
    count_include_pad = op.attr_int("count_include_pad", 0)
    ceil_mode = op.attr_int("ceil_mode", 0)
    spatial0 = 1 if op.attr("layout") == "NHWC" else 2
    padding = []
    for i in range(n_spatial):
        lo, hi = pads[i], pads[i + n_spatial]
        if ceil_mode:
            # same extra-hi-pad derivation as MaxPool above: ceil the output
            # dim, then pad just enough for the last window to fit. The
            # ceil-added region counts as padding (excluded when
            # count_include_pad=0), matching the ONNX reference.
            size = x.shape[spatial0 + i] + lo + hi
            out_dim = -(-(size - kernel[i]) // strides[i]) + 1
            needed = (out_dim - 1) * strides[i] + kernel[i] - size
            hi += max(0, needed)
        padding.append((lo, hi))
    ones = jnp.ones_like(x, dtype=jnp.float32)
    dims, strd, padd = _window_tuples(op, kernel, strides, padding)
    s = lax.reduce_window(x.astype(jnp.float32), 0.0, lax.add, dims, strd, padd)
    if count_include_pad:
        denom = float(np.prod(kernel))
        out = s / denom
    else:
        cnt = lax.reduce_window(ones, 0.0, lax.add, dims, strd, padd)
        out = s / cnt
    return [out.astype(x.dtype)]


@register("GlobalAveragePool")
def _global_avgpool(ctx: Ctx, op, ins):
    x = ins[0]
    if op.attr("layout") == "NHWC":
        red = tuple(range(1, x.ndim - 1))
    else:
        red = tuple(range(2, x.ndim))
    return [_f32_island(ctx, x, lambda v: ctx.xp.mean(v, axis=red, keepdims=True))]


# ---------------------------------------------------------------------------
# Resize (reference: 6120, nearest + bilinear). Index vectors are computed on
# the host at trace time (scales/sizes are static), so on device this lowers
# to pure gathers — no scalar loops.
# ---------------------------------------------------------------------------


def _resize_coords(out_dim: int, in_dim: int, scale: float, mode: str) -> np.ndarray:
    x_out = np.arange(out_dim, dtype=np.float64)
    if mode == "half_pixel":
        return (x_out + 0.5) / scale - 0.5
    if mode == "pytorch_half_pixel":
        return (x_out + 0.5) / scale - 0.5 if out_dim > 1 else np.zeros(out_dim)
    if mode == "align_corners":
        if out_dim == 1:
            return np.zeros(out_dim)
        return x_out * (in_dim - 1) / (out_dim - 1)
    if mode == "asymmetric":
        return x_out / scale
    raise NotImplementedError(f"Resize coordinate_transformation_mode {mode!r}")


@register("Resize")
def _resize(ctx: Ctx, op, ins):
    x = ins[0]
    # inputs: X, roi?, scales?, sizes?
    scales = None
    sizes = None
    if len(ins) > 2 and ins[2] is not None:
        s = ctx.static(ins, 2, "Resize.scales").reshape(-1)
        if s.size:
            scales = [float(v) for v in s]
    if len(ins) > 3 and ins[3] is not None:
        s = ctx.static(ins, 3, "Resize.sizes").reshape(-1)
        if s.size:
            sizes = [int(v) for v in s]
    mode = op.attr("mode", "nearest")
    coord = op.attr("coordinate_transformation_mode", "half_pixel")
    nearest_mode = op.attr("nearest_mode", "round_prefer_floor")

    if op.attr("layout") == "NHWC" and x.ndim == 4:
        # scales/sizes arrive in NCHW axis order (the model's constants);
        # the tensor is channel-last (runtime/layout.py)
        perm = (0, 2, 3, 1)
        if scales is not None:
            scales = [scales[p] for p in perm]
        if sizes is not None:
            sizes = [sizes[p] for p in perm]

    in_shape = list(x.shape)
    if sizes is not None:
        out_shape = sizes
        scales = [o / i for o, i in zip(out_shape, in_shape)]
    else:
        out_shape = [int(math.floor(i * s)) for i, s in zip(in_shape, scales)]

    out = x
    for axis in range(x.ndim):
        if out_shape[axis] == in_shape[axis] and scales[axis] == 1.0:
            continue
        coords = _resize_coords(out_shape[axis], in_shape[axis], scales[axis], coord)
        if mode == "nearest":
            if nearest_mode == "floor":
                idx = np.floor(coords)
            elif nearest_mode == "ceil":
                idx = np.ceil(coords)
            elif nearest_mode == "round_prefer_floor":
                idx = np.ceil(coords - 0.5)
            else:  # round_prefer_ceil
                idx = np.floor(coords + 0.5)
            idx = np.clip(idx, 0, in_shape[axis] - 1).astype(np.int64)
            out = ctx.xp.take(out, idx if ctx.xp is np else jnp.asarray(idx), axis=axis)
        elif mode == "linear":
            lo = np.clip(np.floor(coords), 0, in_shape[axis] - 1).astype(np.int64)
            hi = np.clip(lo + 1, 0, in_shape[axis] - 1)
            frac = np.clip(coords - lo, 0.0, 1.0).astype(np.float32)
            shape = [1] * out.ndim
            shape[axis] = out_shape[axis]
            w = frac.reshape(shape)
            take = ctx.xp.take
            g_lo = take(out, lo if ctx.xp is np else jnp.asarray(lo), axis=axis)
            g_hi = take(out, hi if ctx.xp is np else jnp.asarray(hi), axis=axis)
            dt = out.dtype
            out = (g_lo.astype(np.float32) * (1.0 - w) + g_hi.astype(np.float32) * w).astype(dt)
        else:
            raise NotImplementedError(f"Resize mode {mode!r}")
    return [out]
