"""Fused GroupNorm + affine + SiLU + 3x3 conv Pallas kernel (NCHW).

Why this shape of kernel: every earlier hand-fusion attempt on the SD UNet
lost to XLA on v5e for one of two reasons (docs/tpu_notes.md scoreboard):
an opaque kernel that REPLACES only the elementwise chain evicts those ops
from XLA's conv fusions (gn_silu: +9 ms), and an XLA-side im2col feeding an
opaque matmul pays 9x activation HBM traffic (pallas smallconv: +0.9 ms).
This kernel removes both failure modes at once: it absorbs the whole
GroupNorm -> affine -> SiLU -> Conv3x3 producer chain, reads the activation
slab from HBM exactly once, forms the nine taps *in VMEM* with lane rolls
(no im2col materialization), and leaves XLA nothing around the conv to
un-fuse. The resnet stacks it targets are where the step spends its conv
time (~6.3 ms of 11.5 at ~16% effective MFU).

Layout: activations stay in the graph's native (N, C, HW) slab form — the
conv is computed transposed, y[o, r] = sum_t sum_c w[o, c, t] * xn[c, r+off_t],
so no NCHW<->NHWC transposes enter the graph. The weight arrives
pre-transposed as (9, O, C) (one host-side relayout at upload, see
WeightArg.transform 't9oc' in runtime/planner.py) because slicing a
(O, C, 3, 3) block tap-wise in VMEM would tile the trailing (3, 3) dims at
(8, 128) — a 100x padding blowup.

Reference semantics: the converter decomposes GroupNorm into Reshape ->
InstanceNormalization -> Reshape -> Mul(gamma) -> Add(beta) (+ Sigmoid/Mul
for SiLU) and the conv is ONNX Conv 3x3 stride-1 pad-1 group-1
(/root/reference/src/onnxstream.cpp:4788 InstanceNormalization, :4639 Conv);
the fused op reproduces that chain in one pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from onnxstream_tpu.kernels.gn_silu import gn_silu_reference


def w9_to_oihw(w9: jax.Array) -> jax.Array:
    """(9, O, C) upload layout -> (O, C, 3, 3) ONNX layout (oracle paths)."""
    nine, o, c = w9.shape
    assert nine == 9
    return jnp.transpose(w9.reshape(3, 3, o, c), (2, 3, 0, 1))


def oihw_to_w9(w: np.ndarray) -> np.ndarray:
    """(O, C, 3, 3) -> (9, O, C): the 't9oc' upload transform (host side)."""
    o, c = w.shape[0], w.shape[1]
    return np.ascontiguousarray(w.transpose(2, 3, 0, 1).reshape(9, o, c))


def gn_silu_conv_reference(x, sg, sb, gamma, beta, w9, bias, groups: int,
                           eps: float):
    """jnp oracle (and the CPU/non-TPU execution path). x: (N, C, H, W)."""
    y = gn_silu_reference(x, sg, sb, gamma, beta, groups, eps, silu=True)
    w = w9_to_oihw(w9).astype(y.dtype)
    dn = jax.lax.conv_dimension_numbers(y.shape, w.shape, ("NCHW", "OIHW", "NCHW"))
    out = jax.lax.conv_general_dilated(
        y, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias.astype(jnp.float32).reshape(1, -1, 1, 1)
    return out.astype(x.dtype)


def _make_kernel(groups: int, eps: float, hgt: int, wid: int, has_bias: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(*refs):
        if has_bias:
            x_ref, sg_ref, sb_ref, g_ref, b_ref, w_ref, bias_ref, o_ref, xn_ref = refs
        else:
            x_ref, sg_ref, sb_ref, g_ref, b_ref, w_ref, o_ref, xn_ref = refs
            bias_ref = None
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _normalize():
            # GroupNorm moments + folded affine + SiLU, once per batch row
            # (the j grid axis re-enters this kernel per output-channel
            # block; the normalized slab persists in VMEM scratch). Same
            # iota-fold trick as kernels/gn_silu.py: value reshapes across
            # the sublane tiling relayout, so group moments come from tiny
            # (G, C) 0/1 matmuls instead.
            x = x_ref[...].astype(jnp.float32)  # (C, HW)
            c, hw = x.shape
            cg = c // groups
            s1 = jnp.sum(x, axis=1, keepdims=True)  # (C, 1)
            s2 = jnp.sum(x * x, axis=1, keepdims=True)
            fold = (
                jax.lax.broadcasted_iota(jnp.int32, (groups, c), 1) // cg
                == jax.lax.broadcasted_iota(jnp.int32, (groups, c), 0)
            ).astype(jnp.float32)
            unfold = (
                jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // cg
                == jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
            ).astype(jnp.float32)
            cnt = cg * hgt * wid
            hi = jax.lax.Precision.HIGHEST
            s1g = jnp.dot(fold, s1, preferred_element_type=jnp.float32, precision=hi)
            s2g = jnp.dot(fold, s2, preferred_element_type=jnp.float32, precision=hi)
            mean = s1g / cnt
            var = jnp.maximum(s2g / cnt - mean * mean, 0.0)
            rstd = jax.lax.rsqrt(var + eps)
            ag = rstd * sg_ref[...].astype(jnp.float32)
            bg = sb_ref[...].astype(jnp.float32) - mean * ag
            a_c = jnp.dot(unfold, ag, preferred_element_type=jnp.float32, precision=hi)
            b_c = jnp.dot(unfold, bg, preferred_element_type=jnp.float32, precision=hi)
            gam = g_ref[...].astype(jnp.float32)
            a_c = a_c * gam
            b_c = b_c * gam + b_ref[...].astype(jnp.float32)
            y = x * a_c + b_c
            y = y * jax.nn.sigmoid(y)
            # scratch stays f32: Mosaic's lane rotate only handles 32-bit
            # data ("Rotate with non-32-bit data"); the per-tap cast to the
            # MXU input dtype happens after the roll.
            xn_ref[...] = y

        xn = xn_ref[...]
        hw = xn.shape[1]
        mxu_dt = w_ref.dtype
        r = jax.lax.broadcasted_iota(jnp.int32, (1, hw), 1)
        col = jax.lax.rem(r, wid)
        acc = None
        for t in range(9):
            di, dj = t // 3 - 1, t % 3 - 1
            off = di * wid + dj
            # z[:, r] = xn[:, r + off] — a pure-VMEM lane roll, then the tap
            # matmul; invalid taps (H overflow via flat range, W wrap via
            # column range) are masked on the (bn, HW) result, which is
            # cheaper than masking the (C, HW) operand when bn < C.
            z = pltpu.roll(xn, (-off) % hw, axis=1) if off else xn
            d = jnp.dot(w_ref[t], z.astype(mxu_dt),
                        preferred_element_type=jnp.float32)
            src = r + off
            valid = (src >= 0) & (src < hw) & (col + dj >= 0) & (col + dj < wid)
            d = jnp.where(valid, d, 0.0)
            acc = d if acc is None else acc + d
        if bias_ref is not None:
            acc = acc + bias_ref[...].astype(jnp.float32)
        o_ref[...] = acc.astype(o_ref.dtype)

    return kernel


_VMEM_LIMIT = 32 << 20  # scoped-vmem hint passed to Mosaic (v5e accepts 32M)
_VMEM_CAP = 24 << 20    # working-set budget the block picker plans against


def _pick_bn(o: int, c: int, hw: int, itemsize: int,
             vmem_cap: int = _VMEM_CAP) -> int:
    """Largest 8-multiple divisor of O whose VMEM working set fits. Counts
    the x slab, the f32 xn scratch, one roll temp (f32) + one cast temp
    (compute dtype), the f32 accumulator, and the w/out blocks at 2x for
    Mosaic's double buffering; lanes pad to 128."""
    hw_pad = ((hw + 127) // 128) * 128
    fixed = c * hw_pad * (2 * itemsize + 8)
    best = 0
    bn = 8
    while bn <= min(o, 512):
        if o % bn == 0:
            need = (fixed
                    + bn * hw_pad * (4 + 2 * itemsize)
                    + 2 * 9 * bn * c * itemsize)
            if need <= vmem_cap:
                best = bn
        bn += 8
    return best


@functools.partial(
    jax.jit, static_argnames=("groups", "eps", "interpret")
)
def gn_silu_conv_pallas(x, sg, sb, gamma, beta, w9, bias=None, *,
                        groups: int, eps: float, interpret: bool = False):
    """Fused chain on TPU. x (N, C, H, W), w9 (9, O, C) -> (N, O, H, W).
    Grid (N, O/bn); each batch row's (C, HW) slab is VMEM-resident, the
    normalized+activated slab lives in scratch across the O-block sweep."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, c, h, w = x.shape
    o = w9.shape[1]
    hw = h * w
    x3 = x.reshape(n, c, hw)
    bn = _pick_bn(o, c, hw, x.dtype.itemsize)
    if not bn:
        raise NotImplementedError(f"gn_silu_conv: no VMEM-feasible O block for {x.shape}")

    in_specs = [
        pl.BlockSpec((None, c, hw), lambda i, j: (i, 0, 0)),
        pl.BlockSpec((groups, 1), lambda i, j: (0, 0)),
        pl.BlockSpec((groups, 1), lambda i, j: (0, 0)),
        pl.BlockSpec((c, 1), lambda i, j: (0, 0)),
        pl.BlockSpec((c, 1), lambda i, j: (0, 0)),
        pl.BlockSpec((9, bn, c), lambda i, j: (0, j, 0)),
    ]
    args = [x3, sg.reshape(groups, 1), sb.reshape(groups, 1),
            gamma.reshape(c, 1), beta.reshape(c, 1), w9]
    if bias is not None:
        in_specs.append(pl.BlockSpec((bn, 1), lambda i, j: (j, 0)))
        args.append(bias.reshape(o, 1))

    out = pl.pallas_call(
        _make_kernel(groups, eps, h, w, bias is not None),
        grid=(n, o // bn),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((None, bn, hw), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((n, o, hw), x.dtype),
        scratch_shapes=[pltpu.VMEM((c, hw), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(*args)
    return out.reshape(n, o, h, w)


def gn_silu_conv(x, sg, sb, gamma, beta, w9, bias=None, *, groups: int,
                 eps: float, interpret: bool = False):
    """Dispatcher: Pallas on TPU (or interpret=True for tests), jnp oracle
    elsewhere."""
    use_pallas = interpret
    if not use_pallas:
        try:
            use_pallas = jax.default_backend() == "tpu"
        except Exception:
            use_pallas = False
    if use_pallas and x.shape[1] % groups == 0:
        try:
            return gn_silu_conv_pallas(
                x, sg, sb, gamma, beta, w9, bias, groups=groups, eps=eps,
                interpret=interpret,
            )
        except NotImplementedError:
            pass
    return gn_silu_conv_reference(x, sg, sb, gamma, beta, w9, bias, groups, eps)
