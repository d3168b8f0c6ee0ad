"""Fused GroupNorm + affine + SiLU Pallas kernel (NCHW).

The SD UNet spends most of its non-conv, non-attention time in the
GroupNorm -> scale/shift -> SiLU chains in front of every resnet conv
(docs/tpu_notes.md: ~0.8 ms/step of normalization statistics plus a share
of the elementwise-fusion bucket at 11.5 ms/step). XLA executes each chain
as a stats reduction over the activation plus at least one more full
read/write pass for the normalize+affine+silu apply. This kernel does the
whole chain in ONE pass over HBM: each grid step owns one batch row, loads
its (C, H*W) slab into VMEM once, computes the per-group moments there,
applies the folded affine and the optional SiLU, and writes the result —
activation bytes move exactly twice (read + write), and Mosaic
double-buffers the slabs across grid steps so the pass runs at HBM speed.

A/B verdict (real v5e, SD1.5 UNet, 2026-08): the fused path LOSES —
21.45 ms/step (21.0 with a 32 MB VMEM limit hint) vs 11.9 ms decomposed.
The custom call is an opaque fusion barrier: XLA had been folding the
normalize/affine/silu applies into the convolution pre/post passes, and
severing that costs ~9 ms while the kernel saves <1 ms of norm-pass HBM
traffic. `fuse_groupnorm` therefore defaults OFF (runtime/config.py); the
kernel stays as a correct, tested option for standalone-norm workloads
where there is no adjacent producer/consumer to fuse into.

Reference semantics: the converter decomposes GroupNorm into
Reshape(N,G,-1) -> InstanceNormalization(eps) -> Reshape -> Mul(gamma) ->
Add(beta) (convert/builder.py group_norm, mirroring the ONNX exports the
reference executes op-by-op via onnxstream.cpp:4788 InstanceNormalization).
The fused op honors all four parameter tensors: per-group InstanceNorm
scale/bias (ones/zeros from the converter, but arbitrary values are
respected) and per-channel gamma/beta, folded into one FMA:

    A_c = rstd_g * sg_g * gamma_c
    B_c = (-mean_g * rstd_g * sg_g + sb_g) * gamma_c + beta_c
    y   = x * A_c + B_c          (then y = y * sigmoid(y) if silu)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def gn_silu_reference(x, sg, sb, gamma, beta, groups: int, eps: float, silu: bool):
    """jnp oracle (and the CPU/non-TPU execution path). x: (N, C, H, W)."""
    n, c = x.shape[0], x.shape[1]
    cg = c // groups
    dt = x.dtype
    xf = x.astype(jnp.float32).reshape(n, groups, -1)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    mean2 = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    norm = (xf - mean) * jax.lax.rsqrt(var + eps)
    norm = norm * sg.astype(jnp.float32).reshape(1, groups, 1) + sb.astype(
        jnp.float32
    ).reshape(1, groups, 1)
    y = norm.reshape(x.shape)
    y = y * gamma.astype(jnp.float32).reshape(1, c, 1, 1) + beta.astype(
        jnp.float32
    ).reshape(1, c, 1, 1)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(dt)


def _kernel(x_ref, sg_ref, sb_ref, g_ref, b_ref, o_ref, *, groups: int,
            eps: float, silu: bool):
    """One batch row per grid step; the whole (C, HW) slab is VMEM-resident
    (<= ~5 MB bf16 at SD sizes; v5e VMEM is far larger). Group moments via
    per-CHANNEL lane reductions folded by a tiny iota-built (G, C) 0/1
    matmul — Mosaic forbids blocks whose second-minor dim is the (unaligned)
    C/G channels-per-group, and value reshapes across the sublane tiling
    would relayout; the fold avoids both."""
    x = x_ref[...].astype(jnp.float32)  # (C, HW)
    c, hw = x.shape
    cg = c // groups
    s1 = jnp.sum(x, axis=1, keepdims=True)  # (C, 1)
    s2 = jnp.sum(x * x, axis=1, keepdims=True)
    fold = (
        jax.lax.broadcasted_iota(jnp.int32, (groups, c), 1) // cg
        == jax.lax.broadcasted_iota(jnp.int32, (groups, c), 0)
    ).astype(jnp.float32)  # (G, C): fold[g, ch] = ch in group g
    unfold = (
        jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // cg
        == jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    ).astype(jnp.float32)  # (C, G)
    cnt = cg * hw
    # HIGHEST precision: the MXU's default f32 path truncates through bf16
    # passes, and the partial sums here have magnitude ~hw, so a bf16-rounded
    # moment costs ~3e-2 absolute output error (measured on chip). These dots
    # are (G,C)x(C,1) — forcing the exact f32 mode is free.
    hi = jax.lax.Precision.HIGHEST
    s1g = jnp.dot(fold, s1, preferred_element_type=jnp.float32, precision=hi)
    s2g = jnp.dot(fold, s2, preferred_element_type=jnp.float32, precision=hi)
    mean = s1g / cnt
    var = jnp.maximum(s2g / cnt - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    sg = sg_ref[...].astype(jnp.float32)  # (G, 1)
    sb = sb_ref[...].astype(jnp.float32)
    ag = rstd * sg
    bg = sb - mean * ag
    a_c = jnp.dot(unfold, ag, preferred_element_type=jnp.float32,
                  precision=hi)  # (C, 1)
    b_c = jnp.dot(unfold, bg, preferred_element_type=jnp.float32,
                  precision=hi)
    gam = g_ref[...].astype(jnp.float32)  # (C, 1)
    bet = b_ref[...].astype(jnp.float32)
    a_c = a_c * gam
    b_c = b_c * gam + bet
    y = x * a_c + b_c
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("groups", "eps", "silu", "interpret")
)
def gn_silu_pallas(x, sg, sb, gamma, beta, groups: int, eps: float, silu: bool,
                   interpret: bool = False):
    """One-HBM-pass fused kernel. Grid = (N,); block = one batch row's full
    (C, HW) slab (2.6 MB bf16 at the SD1.5 64x64 level; v5e VMEM holds it
    comfortably). Mosaic requires the last two block dims 8/128-divisible or
    equal to the array dims — a per-group (C/G, HW) block violates the
    sublane rule for C/G like 10, so the slab spans C and the kernel folds
    groups internally."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, c = x.shape[0], x.shape[1]
    hw = int(np.prod(x.shape[2:]))
    x3 = x.reshape(n, c, hw)
    sg2 = sg.reshape(groups, 1)
    sb2 = sb.reshape(groups, 1)
    g2 = gamma.reshape(c, 1)
    b2 = beta.reshape(c, 1)

    out = pl.pallas_call(
        functools.partial(_kernel, groups=groups, eps=eps, silu=silu),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((None, c, hw), lambda i: (i, 0, 0)),
            pl.BlockSpec((groups, 1), lambda i: (0, 0)),
            pl.BlockSpec((groups, 1), lambda i: (0, 0)),
            pl.BlockSpec((c, 1), lambda i: (0, 0)),
            pl.BlockSpec((c, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, c, hw), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c, hw), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(x3, sg2, sb2, g2, b2)
    return out.reshape(x.shape)


def gn_silu(x, sg, sb, gamma, beta, groups: int, eps: float, silu: bool,
            interpret: bool = False):
    """Dispatcher: Pallas on TPU (or interpret=True for tests), jnp oracle
    elsewhere. Requires C % groups == 0; any N/H/W."""
    use_pallas = interpret
    if not use_pallas:
        try:
            use_pallas = jax.default_backend() == "tpu"
        except Exception:
            use_pallas = False
    c = x.shape[1]
    if use_pallas and c % groups == 0 and x.ndim >= 3:
        try:
            return gn_silu_pallas(
                x, sg, sb, gamma, beta, groups=groups, eps=eps, silu=silu,
                interpret=interpret,
            )
        except NotImplementedError:
            pass
    return gn_silu_reference(x, sg, sb, gamma, beta, groups, eps, silu)
