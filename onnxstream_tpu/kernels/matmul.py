"""Tiled bf16 Pallas matmul with f32 accumulation (MXU), and an
im2col 3x3-conv wrapper built on it.

Why this exists: XLA's conv emitters on the SD UNet's small-spatial levels
(16x16/8x8, 1280-2560 channels) run at ~10-12% effective MFU, and every
source-level reformulation (dot_convs, rowdot — docs/tpu_notes.md) LOST
because XLA recognizes `reshape(dot(im2col))` and rewrites it back into the
same conv schedule. A Pallas kernel is opaque to that rewrite: the im2col
matmul actually executes as a plain (M, 9C) x (9C, Co) MXU matmul, which is
the shape the systolic array is best at. The reference hits the same op mix
through XNNPACK's NHWC GEMM-based convs (/root/reference/src/onnxstream.cpp
Conv via xnn_create_convolution2d_nhwc_*); this is the TPU-native analog.

Scope: K and N must be multiples of 128 (lane tiling); M must be a multiple
of 16 or small enough to be one block (bf16 sublane tiling). The conv
wrapper therefore gates on C % 128 == 0 taps (9C lane-aligned) — exactly
the UNet's 640/1280/2560-channel levels where XLA's schedule is weakest.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _pick_block(dim: int, align: int, cap: int) -> int:
    """Largest divisor of `dim` that is a multiple of `align` and <= cap;
    falls back to `dim` itself (single block) if none exists."""
    best = 0
    d = align
    while d <= min(dim, cap):
        if dim % d == 0:
            best = d
        d += align
    return best if best else dim


def _make_kernel(k_steps: int, has_bias: bool):
    from jax.experimental import pallas as pl

    def kernel(*refs):
        if has_bias:
            a_ref, b_ref, bias_ref, o_ref, acc_ref = refs
        else:
            a_ref, b_ref, o_ref, acc_ref = refs
            bias_ref = None
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _zero():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += jnp.dot(
            a_ref[...], b_ref[...], preferred_element_type=jnp.float32
        )

        @pl.when(k == k_steps - 1)
        def _flush():
            acc = acc_ref[...]
            if bias_ref is not None:
                acc = acc + bias_ref[...].astype(jnp.float32)
            o_ref[...] = acc.astype(o_ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "bm", "bn", "bk", "interpret"),
)
def matmul_pallas(a, b, bias=None, *, out_dtype=None, bm: int = 0,
                  bn: int = 0, bk: int = 0, interpret: bool = False):
    """C = A @ B (+ bias), A:(M,K) B:(K,N) bias:(N,) — f32 MXU accumulation,
    grid (M/bm, N/bn, K/bk) with the K axis innermost-arbitrary so each
    (m, n) tile's accumulator lives in VMEM scratch across the K sweep and
    A/B tiles stream through the double buffer at HBM speed."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = a.shape
    k2, n = b.shape
    assert k == k2, (a.shape, b.shape)
    out_dtype = out_dtype or a.dtype
    bm = bm or _pick_block(m, 16, 256)
    bn = bn or _pick_block(n, 128, 512)
    bk = bk or _pick_block(k, 128, 2048)
    k_steps = k // bk

    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
        pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
    ]
    args = [a, b]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j, kk: (0, j)))
        args.append(bias.reshape(1, n))

    out = pl.pallas_call(
        _make_kernel(k_steps, bias is not None),
        grid=(m // bm, n // bn, k_steps),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(*args)
    return out


def matmul_supported(m: int, k: int, n: int) -> bool:
    """Shapes the kernel handles without masking: lane dims 128-aligned,
    M a multiple of 16, or an 8-aligned M small enough that _pick_block's
    whole-dim fallback (a single M block) keeps a bounded VMEM working set."""
    return k % 128 == 0 and n % 128 == 0 and (m % 16 == 0 or (m % 8 == 0 and m <= 1024))


def conv3x3_im2col_pallas(x_nhwc, w_oihw, bias=None, *, out_dtype=None,
                          interpret: bool = False):
    """3x3 stride-1 pad-1 conv as XLA-side im2col + the Pallas matmul.

    x: (N, H, W, C), w: (O, C, 3, 3), bias: (O,) -> (N, H, W, O).
    The nine shifted windows concatenate along the channel axis (tap-major,
    matching w transposed to (3, 3, C, O) -> (9C, O)); the concat is pure
    HBM traffic (~2x the activation bytes at these small-spatial levels,
    tens of microseconds) and buys a matmul the MXU runs at several times
    the direct-conv schedule's effective MFU (measured: tools/ab_smallconv).
    """
    n, h, w, c = x_nhwc.shape
    o = w_oihw.shape[0]
    xp = jnp.pad(x_nhwc, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [
        xp[:, i : i + h, j : j + w, :].reshape(n * h * w, c)
        for i in range(3)
        for j in range(3)
    ]
    a2 = jnp.concatenate(cols, axis=1)  # (M, 9C)
    w2 = jnp.transpose(w_oihw, (2, 3, 1, 0)).reshape(9 * c, o).astype(a2.dtype)
    y = matmul_pallas(a2, w2, bias, out_dtype=out_dtype or x_nhwc.dtype,
                      interpret=interpret)
    return y.reshape(n, h, w, o)
