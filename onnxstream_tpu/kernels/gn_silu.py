"""Fused GroupNorm + affine + SiLU Pallas kernel (NCHW).

The SD UNet spends most of its non-conv, non-attention time in the
GroupNorm -> scale/shift -> SiLU chains in front of every resnet conv
(docs/tpu_notes.md: ~0.8 ms/step of normalization statistics plus a share
of the elementwise-fusion bucket at 11.5 ms/step). XLA executes each chain
as a stats reduction over the activation plus at least one more full
read/write pass for the normalize+affine+silu apply. This kernel does the
whole chain in ONE pass over HBM: each grid step owns one (group, batch)
pair, loads that group's (C/G, H*W) slab into VMEM once, computes the
moments there, applies the folded affine and the optional SiLU, and writes
the result — activation bytes move exactly twice (read + write), and
Mosaic double-buffers the slabs across grid steps so the pass runs at HBM
speed.

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


def _kernel(x_ref, sg_ref, sb_ref, g_ref, b_ref, o_ref, *, eps: float, silu: bool):
    x = x_ref[...].astype(jnp.float32)  # (cg, HW) — one group's slab
    cnt = x.shape[0] * x.shape[1]
    s1 = jnp.sum(x)
    s2 = jnp.sum(jnp.square(x))
    mean = s1 / cnt
    var = jnp.maximum(s2 / cnt - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    sg = sg_ref[0, 0].astype(jnp.float32)
    sb = sb_ref[0, 0].astype(jnp.float32)
    gam = g_ref[...].astype(jnp.float32)  # (cg, 1)
    bet = b_ref[...].astype(jnp.float32)  # (cg, 1)
    a = rstd * sg * gam
    b = (sb - mean * rstd * sg) * gam + bet
    y = x * a + b
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("groups", "eps", "silu", "interpret")
)
def gn_silu_pallas(x, sg, sb, gamma, beta, groups: int, eps: float, silu: bool,
                   interpret: bool = False):
    """One-HBM-pass fused kernel. Grid = (N, G); block = one group's
    (C/G, H*W) slab (80-320 KB at SD1.5/SDXL sizes — VMEM-trivial, so the
    pipeline double-buffers and the whole chain is bandwidth-bound)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, c = x.shape[0], x.shape[1]
    hw = int(np.prod(x.shape[2:]))
    cg = c // groups
    x3 = x.reshape(n, c, hw)
    sg2 = sg.reshape(groups, 1)
    sb2 = sb.reshape(groups, 1)
    g2 = gamma.reshape(c, 1)
    b2 = beta.reshape(c, 1)

    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, silu=silu),
        grid=(n, groups),
        in_specs=[
            pl.BlockSpec((None, cg, hw), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1), lambda i, j: (j, 0)),
            pl.BlockSpec((1, 1), lambda i, j: (j, 0)),
            pl.BlockSpec((cg, 1), lambda i, j: (j, 0)),
            pl.BlockSpec((cg, 1), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((None, cg, hw), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c, hw), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
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
