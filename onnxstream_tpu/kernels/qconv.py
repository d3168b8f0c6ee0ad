"""W8A8 asymmetric-uint8 convolution on the MXU.

Quantized counterpart of the reference's XNNPACK qu8 convolution path
(reference src/onnxstream.cpp:4631-4689: uint8 X and W with per-tensor
(scale, zero_point), fp32 bias rescaled to int32 by 1/(sx*sw), output
requantized with the op's calibrated range).

TPU-native design: a convolution IS a matmul over extracted patches, and the
MXU wants exactly that shape of work. So the kernel is

    im2col (uint8, padding filled with the input zero point, as XNNPACK pads
    qu8 inputs) -> the Pallas W8A8 matmul kernel (kernels/qmatmul.py) with
    M = N*Ho*Wo, K = C*Kh*Kw, N = O

which keeps all the integer arithmetic in one MXU kernel with the zero-point
corrections and (de)quantization fused into its epilogue. The uint8 patch
tensor is 1/4 the bytes of a float im2col, so the expansion costs less HBM
than running the same conv in float.

Accumulation is fp32 (see kernels/qmatmul.py for the <1 relative ULP bound vs
XNNPACK's exact int32); `qconv_reference` is the exact int32 oracle used by
tests.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from onnxstream_tpu.kernels.qmatmul import qmatmul


def _im2col_u8(
    x_q: jax.Array,
    kh: int,
    kw: int,
    strides: Sequence[int],
    pads: Sequence[int],
    dilations: Sequence[int],
    pad_value: int,
):
    """(N, C, H, W) u8 -> ((N*Ho*Wo, C*Kh*Kw) u8 patches, (N, Ho, Wo)).

    Patch column ordering is c-major then (kh, kw), matching a reshape of
    OIHW weights to (O, C*Kh*Kw)."""
    n, c, h, w = x_q.shape
    sh, sw = strides
    dh, dw = dilations
    pt, pl_, pb, pr = pads  # ONNX order: top, left, bottom, right
    xp = jnp.pad(x_q, ((0, 0), (0, 0), (pt, pb), (pl_, pr)), constant_values=pad_value)
    hp, wp = h + pt + pb, w + pl_ + pr
    ho = (hp - ((kh - 1) * dh + 1)) // sh + 1
    wo = (wp - ((kw - 1) * dw + 1)) // sw + 1
    cols = []
    for i in range(kh):
        for j in range(kw):
            sl = xp[:, :, i * dh : i * dh + (ho - 1) * sh + 1 : sh,
                    j * dw : j * dw + (wo - 1) * sw + 1 : sw]
            cols.append(sl)  # (N, C, Ho, Wo)
    # (Kh*Kw, N, C, Ho, Wo) -> (N, Ho, Wo, C, Kh*Kw)
    pat = jnp.stack(cols, axis=0).transpose(1, 3, 4, 2, 0)
    return pat.reshape(n * ho * wo, c * kh * kw), (n, ho, wo)


def qconv(
    x_q: jax.Array,
    w_q: jax.Array,
    a_scale: float,
    a_zero: int,
    w_scale: float,
    w_zero: int,
    bias: Optional[jax.Array] = None,
    strides: Sequence[int] = (1, 1),
    pads: Sequence[int] = (0, 0, 0, 0),
    dilations: Sequence[int] = (1, 1),
    out_scale: Optional[float] = None,
    out_zero: Optional[int] = None,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:
    """u8 NCHW (N,C,H,W) x u8 OIHW (O,C,Kh,Kw) -> NCHW.

    With (out_scale, out_zero): requantized uint8 output, the reference qu8
    conv (src/onnxstream.cpp:4664-4689). Without: dequantized float.
    `bias` is the model's float (O,) vector; the 1/(a_scale*w_scale) rescale
    to accumulator units (reference's int32 bias conversion,
    src/onnxstream.cpp:4645-4660) happens here."""
    o, _, kh, kw = w_q.shape
    a2, (n, ho, wo) = _im2col_u8(x_q, kh, kw, strides, pads, dilations, int(a_zero))
    w2 = w_q.reshape(o, -1).T  # (C*Kh*Kw, O)
    b = None
    if bias is not None:
        # truncate-toward-zero like the reference's int32 cast (onnxstream.cpp:4655)
        b = (jnp.asarray(bias, jnp.float32) / (float(a_scale) * float(w_scale))
             ).astype(jnp.int32).astype(jnp.float32)
    y = qmatmul(
        a2, w2, a_scale, a_zero, w_scale, w_zero,
        out_scale=out_scale, out_zero=out_zero, bias=b,
        out_dtype=out_dtype, interpret=interpret,
    )
    return y.reshape(n, ho, wo, o).transpose(0, 3, 1, 2)


def qconv_reference(
    x_q, w_q, a_scale, a_zero, w_scale, w_zero, bias=None,
    strides=(1, 1), pads=(0, 0, 0, 0), dilations=(1, 1),
    out_scale=None, out_zero=None,
):
    """Exact int32 oracle (the XNNPACK-equivalent math) for tests."""
    n, c, h, w = x_q.shape
    o, _, kh, kw = w_q.shape
    sh, sw = strides
    dh, dw = dilations
    pt, pl_, pb, pr = pads
    xp = np.pad(np.asarray(x_q, np.int32), ((0, 0), (0, 0), (pt, pb), (pl_, pr)),
                constant_values=int(a_zero)) - int(a_zero)
    wi = np.asarray(w_q, np.int32) - int(w_zero)
    hp, wp = h + pt + pb, w + pl_ + pr
    ho = (hp - ((kh - 1) * dh + 1)) // sh + 1
    wo = (wp - ((kw - 1) * dw + 1)) // sw + 1
    acc = np.zeros((n, o, ho, wo), np.int64)
    for i in range(kh):
        for j in range(kw):
            sl = xp[:, :, i * dh : i * dh + (ho - 1) * sh + 1 : sh,
                    j * dw : j * dw + (wo - 1) * sw + 1 : sw]
            acc += np.einsum("nchw,oc->nohw", sl, wi[:, :, i, j], dtype=np.int64)
    acc = acc.astype(np.float64)
    if bias is not None:
        # reference truncates bias/(sx*sw) to int32 (onnxstream.cpp:4655)
        bi = (np.asarray(bias, np.float64) / (a_scale * w_scale)).astype(np.int64)
        acc += bi[None, :, None, None]
    out = acc * (a_scale * w_scale)
    if out_scale is not None:
        return np.clip(np.round(out / out_scale) + out_zero, 0, 255).astype(np.uint8)
    return out.astype(np.float32)
