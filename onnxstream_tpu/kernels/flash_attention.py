"""Blockwise Pallas flash-attention kernel (TPU).

Subsumes both reference attention accelerations with one kernel:

  * attention slicing (reference src/onnxstream.cpp:6696-6928) — the (M, N)
    score matrix exists only one (block_q, block_kv) tile at a time in VMEM,
    so the 512 MB (8,4096,4096) UNet tensor (reference README.md:151-159)
    never materializes;
  * fused SDPA with GQA + additive mask (src/onnxstream.cpp:7767-7882).

Online softmax: running row-max and row-sum are carried across KV blocks in
VMEM scratch; the output block is rescaled incrementally and written once on
the last KV step. Head dims are zero-padded to a lane multiple (128) outside
the kernel; KV length is padded to the block size with column masking inside.
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

NEG_INF = -1e30
LOG2_E = 1.4426950408889634


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _fa_kernel(
    q_ref,
    k_ref,
    v_ref,
    mask_ref,
    o_ref,
    m_scr,
    l_scr,
    acc_scr,
    *,
    scale: float,
    causal: bool,
    n_valid: int,
    block_n: int,
    offset: int,
    precision=None,
    packed: bool = False,
):
    # grid axes: (bh, i, j) standard, (b, h, i, j) packed
    ax_i, ax_j = (2, 3) if packed else (1, 2)
    nj = pl.num_programs(ax_j)
    j = pl.program_id(ax_j)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # operands stay in their storage dtype: bf16 inputs take single-pass MXU
    # dots with fp32 accumulation (preferred_element_type); fp32 inputs keep
    # the HIGHEST-precision parity path. An up-front astype(f32) would force
    # multi-pass fp32 MXU work (~6x slower) for bf16 models.
    #
    # Softmax runs in the log2 domain: scale*log2(e) is folded into the
    # (bm, d) Q tile before the dot, so the kernel never spends a
    # full-(bm, bn) VPU op on the scale multiply or the ln->log2 conversion
    # that a plain exp() would need — exp2 is the hardware transcendental.
    # exp2(s2 - m2) == exp(s - m) exactly (monotone rescale), so the online
    # max/sum bookkeeping is unchanged.
    q = q_ref[0] * jnp.asarray(scale * LOG2_E, q_ref.dtype)  # (bm, d)
    k = k_ref[0]  # (bn, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision,
    )  # (bm, bn) fp32, log2-domain logits

    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_n
    if n_valid % block_n != 0:
        s = jnp.where(col < n_valid, s, NEG_INF)
    if mask_ref is not None:
        # the wrapper pre-multiplies the additive mask by log2(e)
        s = s + mask_ref[0]
    if causal:
        i = pl.program_id(ax_i)
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + i * q.shape[0]
        s = jnp.where(col <= row + offset, s, NEG_INF)

    m_prev = m_scr[...]  # (bm, 128) replicated
    m_cur = jnp.max(s, axis=1, keepdims=True)  # (bm, 1)
    m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
    corr = jnp.exp2(m_prev - m_new)  # (bm, 128)
    p = jnp.exp2(s - m_new[:, :1])  # (bm, bn)
    if causal and offset < 0:
        # m > n causal: rows past the last key have ZERO valid columns, so
        # every score is exactly the NEG_INF sentinel — which equals the
        # m_scr init, making exp2(s - m_new) = 1 uniformly and the output a
        # silent mean(V). Zero those probabilities so l stays 0 and _finish's
        # denom guard emits 0s for such rows (the flash convention). The
        # extra select stays off every real model's path: offset >= 0
        # whenever m <= n (all decode/prefill and non-causal cases).
        p = jnp.where(s <= NEG_INF * 0.5, 0.0, p)

    l_new = l_scr[...] * corr + jnp.broadcast_to(jnp.sum(p, axis=1, keepdims=True), m_prev.shape)
    v = v_ref[0]  # (bn, dv)
    # probabilities in the value dtype: bf16 PV dot (fp32 accumulate) matches
    # the probs.astype(v.dtype) of the unfused reference path
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    acc_scr[...] = acc_scr[...] * corr[:, :1] + pv
    m_scr[...] = m_new
    l_scr[...] = l_new

    @pl.when(j == nj - 1)
    def _finish():
        denom = l_scr[...][:, :1]
        denom = jnp.where(denom == 0.0, 1.0, denom)
        o_ref[0] = (acc_scr[...] / denom).astype(o_ref.dtype)


def _flash_call(q, k, v, mask, scale, causal, n_valid, block_m, block_n, offset, interpret=False):
    # fp32 inputs get true-fp32 MXU passes (parity with the op library's
    # _mxu_precision policy); bf16 inputs use the fast path.
    precision = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    """q: (BH, Mp, Dp), k/v: (BHkv, Np, Dp), mask: None | (G, Mp, Np)."""
    bh, mp, dp = q.shape
    bhkv, npad, _ = k.shape
    dv = v.shape[-1]
    rep = bh // bhkv
    grid = (bh, mp // block_m, npad // block_n)

    in_specs = [
        pl.BlockSpec((1, block_m, dp), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, block_n, dp), lambda b, i, j, rep=rep: (b // rep, j, 0)),
        pl.BlockSpec((1, block_n, dv), lambda b, i, j, rep=rep: (b // rep, j, 0)),
    ]
    args = [q, k, v]
    if mask is not None:
        g = mask.shape[0]
        grp = bh // g
        in_specs.append(pl.BlockSpec((1, block_m, block_n), lambda b, i, j, grp=grp: (b // grp, i, j)))
        args.append(mask)
        kernel = functools.partial(
            _fa_kernel, scale=scale, causal=causal, n_valid=n_valid, block_n=block_n,
            offset=offset, precision=precision,
        )
    else:
        kernel = functools.partial(
            lambda qr, kr, vr, o, m, l, a, **kw: _fa_kernel(qr, kr, vr, None, o, m, l, a, **kw),
            scale=scale,
            causal=causal,
            n_valid=n_valid,
            block_n=block_n,
            offset=offset,
            precision=precision,
        )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_m, dv), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, mp, dv), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_m, 128), jnp.float32),
            pltpu.VMEM((block_m, 128), jnp.float32),
            pltpu.VMEM((block_m, dv), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bh * mp * npad * dp,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=bh * mp * npad,
        ),
        # (batch*heads, q-blocks) are independent; only the KV axis carries
        # the online-softmax state — telling Mosaic lets it overlap the next
        # block's MXU pass with this block's VPU softmax across grid steps
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    return out


def _flash_call_packed(q, k, v, scale, causal, n_valid, block_m, block_n, offset, heads, interpret=False):
    """Heads-in-lanes variant: q (B, Mp, H*Dp), k/v (B, Np, Hkv*Dp / Hkv*Dvp),
    with Dp/Dvp lane-aligned (128) so each head's columns form whole blocks.

    The block index maps slice one head's columns per grid step, so the
    caller never transposes to (B, H, M, D) and the head split/merge ops
    disappear from the surrounding XLA program (~6 ops per attention).
    Measured perf-neutral on the SD1.5 UNet (docs/tpu_notes.md): XLA lowers
    the projection dot + reshape/pad consumer into a head-axis convolution
    either way, and that form costs only ~0.6 ms/step despite its 8x
    scheduled FLOPs.
    """
    precision = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    h = heads
    b, mp, hdp = q.shape
    dp = hdp // h
    _, npad, hkvdp = k.shape
    hkv = hkvdp // dp
    dvp = v.shape[-1] // hkv
    rep = h // hkv
    # 4-D grid (b, h, q-blocks, kv-blocks): Mosaic index maps only take plain
    # arithmetic (jnp's // and % carry sign-correction branches that fail to
    # lower), so heads get their own grid dimension; GQA maps h -> h/rep with
    # lax.div (non-negative ids, no sign fixup needed)
    grid = (b, h, mp // block_m, npad // block_n)

    def kv_head(hh):
        return jax.lax.div(hh, jnp.int32(rep)) if rep > 1 else hh

    in_specs = [
        pl.BlockSpec((1, block_m, dp), lambda bb, hh, i, j: (bb, i, hh)),
        pl.BlockSpec((1, block_n, dp), lambda bb, hh, i, j: (bb, j, kv_head(hh))),
        pl.BlockSpec((1, block_n, dvp), lambda bb, hh, i, j: (bb, j, kv_head(hh))),
    ]
    kernel = functools.partial(
        lambda qr, kr, vr, o, m, l, a, **kw: _fa_kernel(qr, kr, vr, None, o, m, l, a, **kw),
        scale=scale,
        causal=causal,
        n_valid=n_valid,
        block_n=block_n,
        offset=offset,
        precision=precision,
        packed=True,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_m, dvp), lambda bb, hh, i, j: (bb, i, hh)),
        out_shape=jax.ShapeDtypeStruct((b, mp, h * dvp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_m, 128), jnp.float32),
            pltpu.VMEM((block_m, 128), jnp.float32),
            pltpu.VMEM((block_m, dvp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * mp * npad * dp,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * h * mp * npad,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v)


def flash_attention_packed(
    q,
    k,
    v,
    heads: int,
    scale: Optional[float] = None,
    causal: bool = False,
    block_m: int = 512,
    block_n: int = 1024,
    interpret: bool = False,
    nopad: bool = False,
):
    """Flash SDPA over packed projections: q (B, M, H*D), k/v (B, N, Hkv*D).

    Returns (B, M, H*Dv). Also accepts 2-D (M, H*D) inputs. No mask support
    (callers fall back to the einsum path). See _flash_call_packed for why
    this layout exists.

    nopad=True (config.flash_packed_nopad): when the head dim is not
    lane-aligned (the SD1.5 UNet's d=40), skip the 128-lane zero-pad of each
    head — which materializes 3.2x-sized HBM copies of Q/K/V and reads the
    padding back on every KV block — by transposing to head-major layout and
    running the unpadded kernel (pad_lanes=False: Mosaic masks the partial
    lane tile in place). Trades two unpadded transpose copies for the 3.2x
    padded pad/read traffic; measured A/B on the UNet step decides the
    default (tools/ab_unet.py --nopad-packed, docs/tpu_notes.md).
    """
    if q.ndim == 2:
        return flash_attention_packed(
            q[None], k[None], v[None], heads, scale=scale, causal=causal,
            block_m=block_m, block_n=block_n, interpret=interpret, nopad=nopad,
        )[0]
    if q.ndim != 3:
        raise NotImplementedError(f"flash_attention_packed: rank {q.ndim}")
    b, m, hd = q.shape
    h = heads
    if hd % h:
        raise ValueError(f"packed q width {hd} not divisible by heads {h}")
    d = hd // h
    n = k.shape[1]
    if k.shape[-1] % d or v.shape[-1] % (k.shape[-1] // d):
        raise ValueError("packed k/v widths inconsistent with head dim")
    hkv = k.shape[-1] // d
    dv = v.shape[-1] // hkv
    if h % hkv:
        raise ValueError("GQA requires q_heads % kv_heads == 0")
    if d % 8 or dv % 8:
        raise NotImplementedError("head dims must be multiples of 8")
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    if nopad and (d % 128 or dv % 128):
        qh = q.reshape(b, m, h, d).transpose(0, 2, 1, 3)
        kh = k.reshape(b, n, hkv, d).transpose(0, 2, 1, 3)
        vh = v.reshape(b, n, hkv, dv).transpose(0, 2, 1, 3)
        out = flash_attention(
            qh, kh, vh, scale=scale, causal=causal, block_m=block_m,
            block_n=block_n, interpret=interpret, pad_lanes=False,
        )
        return out.transpose(0, 2, 1, 3).reshape(b, m, h * dv).astype(q.dtype)

    block_m = min(block_m, _ceil_to(m, 8))
    block_n = min(block_n, _ceil_to(n, 128))
    # each head's columns must form whole lane blocks (Mosaic: the block's
    # minor dim must be a 128-multiple unless it spans the whole array dim)
    dp = _ceil_to(d, 128)
    dvp = _ceil_to(dv, 128)

    isz = jnp.dtype(q.dtype).itemsize

    def vmem_est(bm, bn):
        blocks = 2 * (bm * dp + bn * dp + bn * dvp) * isz
        scratch = bm * 128 * 4 * 2 + bm * dvp * 4
        inter = bm * bn * 4 + bm * bn * isz + bm * dvp * 4
        return blocks + scratch + inter + bm * dvp * isz

    budget = 12 << 20
    while vmem_est(block_m, block_n) > budget and block_n > 128:
        block_n //= 2
    while vmem_est(block_m, block_n) > budget and block_m > 8:
        block_m //= 2

    mp = _ceil_to(m, block_m)
    npad = _ceil_to(n, block_n)

    # reshapes of the packed inputs are bitcasts; the pads are the only
    # copies (none at all when d is already lane-aligned)
    def prep(x, ln, lnp, hx, dx, dxp):
        x = x.reshape(b, ln, hx, dx)
        if (lnp, dxp) != (ln, dx):
            x = jnp.pad(x, ((0, 0), (0, lnp - ln), (0, 0), (0, dxp - dx)))
        return x.reshape(b, lnp, hx * dxp)

    qq = prep(q, m, mp, h, d, dp)
    kk = prep(k, n, npad, hkv, d, dp)
    vv = prep(v, n, npad, hkv, dv, dvp)

    out = _flash_call_packed(
        qq, kk, vv, float(scale), causal, n, block_m, block_n, offset=n - m,
        heads=h, interpret=interpret,
    )
    if (mp, dvp) != (m, dv):
        out = out.reshape(b, mp, h, dvp)[:, :m, :, :dv].reshape(b, m, h * dv)
    return out.astype(q.dtype)


def flash_attention(
    q,
    k,
    v,
    mask=None,
    scale: Optional[float] = None,
    k_transposed: bool = False,
    causal: bool = False,
    block_m: int = 512,
    block_n: int = 1024,
    interpret: bool = False,
    pad_lanes: bool = True,
):
    """Flash SDPA over (..., H, M, D) x (..., Hkv, N, D) -> (..., H, M, Dv).

    Also accepts 3-D (H, M, D) inputs. GQA when H != Hkv. `mask` is an
    additive mask broadcastable over heads: (M, N), (1/B, 1/H, M, N).
    """
    if k_transposed:
        k = jnp.swapaxes(k, -1, -2)
    if q.ndim == 3:
        out = flash_attention(
            q[None], k[None], v[None], mask=mask, scale=scale, causal=causal,
            block_m=block_m, block_n=block_n, interpret=interpret,
            pad_lanes=pad_lanes,
        )
        return out[0]
    if q.ndim != 4:
        raise NotImplementedError(f"flash_attention: rank {q.ndim}")

    b, h, m, d = q.shape
    _, hkv, n, _ = k.shape
    dv = v.shape[-1]
    if h % hkv:
        raise ValueError("GQA requires q_heads % kv_heads == 0")
    if d % 8 or dv % 8:
        raise NotImplementedError("head dims must be multiples of 8")
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    block_m = min(block_m, _ceil_to(m, 8))
    block_n = min(block_n, _ceil_to(n, 128))
    # pad_lanes=False keeps the real head dim: Mosaic masks the partial lane
    # tile, so the padded HBM copies of Q/K/V (3.2x bytes at d=40) never
    # materialize; the MXU pass width is the same either way.
    dp = _ceil_to(d, 128) if pad_lanes else d
    dvp = _ceil_to(dv, 128) if pad_lanes else dv

    # clamp blocks to the ~16 MB scoped-VMEM budget (wide-head fp32 cases —
    # e.g. the SDXL VAE mid-block attention, 1 head x d=512 — overflow the
    # defaults: double-buffered q/k/v tiles + fp32 scores + scratch)
    isz = jnp.dtype(q.dtype).itemsize

    def vmem_est(bm, bn):
        blocks = 2 * (bm * dp + bn * dp + bn * dvp) * isz  # double-buffered I/O
        scratch = bm * 128 * 4 * 2 + bm * dvp * 4
        inter = bm * bn * 4 + bm * bn * isz + bm * dvp * 4  # scores, p, pv
        return blocks + scratch + inter + bm * dvp * isz

    budget = 12 << 20
    while vmem_est(block_m, block_n) > budget and block_n > 128:
        block_n //= 2
    while vmem_est(block_m, block_n) > budget and block_m > 8:
        block_m //= 2

    mp = _ceil_to(m, block_m)
    npad = _ceil_to(n, block_n)

    qq = jnp.pad(q, ((0, 0), (0, 0), (0, mp - m), (0, dp - d))).reshape(b * h, mp, dp)
    kk = jnp.pad(k, ((0, 0), (0, 0), (0, npad - n), (0, dp - d))).reshape(b * hkv, npad, dp)
    vv = jnp.pad(v, ((0, 0), (0, 0), (0, npad - n), (0, dvp - dv))).reshape(b * hkv, npad, dvp)

    mm = None
    if mask is not None:
        mask = jnp.asarray(mask)
        if mask.ndim == 2:
            mask = mask[None, None]
        elif mask.ndim == 3:
            # (B, M, N) / (1, M, N): ONNX-style batch mask, no head dim
            mask = mask[:, None]
        if mask.ndim != 4:
            raise NotImplementedError(f"mask rank {mask.ndim}")
        mb, mh, mm_, mn_ = mask.shape
        if (mm_, mn_) != (m, n):
            raise NotImplementedError(f"mask trailing dims {(mm_, mn_)} != {(m, n)}")
        # pad with NEG_INF only on columns (rows beyond m are discarded)
        mask = jnp.pad(mask, ((0, 0), (0, 0), (0, mp - m), (0, npad - n)), constant_values=NEG_INF)
        # group layout must match q's batch-major (b, h) flattening
        if (mb, mh) == (1, 1):
            g = 1
        elif mb == b and mh == 1:
            g = b
        elif mb == b and mh == h:
            g = b * h
        else:
            mask = jnp.broadcast_to(mask, (b, h, mp, npad))
            g = b * h
        # log2-domain (see _fa_kernel); NEG_INF padding saturates either way
        mm = mask.reshape(g, mp, npad).astype(jnp.float32) * LOG2_E

    out = _flash_call(
        qq, kk, vv, mm, float(scale), causal, n, block_m, block_n, offset=n - m,
        interpret=interpret,
    )
    out = out.reshape(b, h, mp, dvp)[:, :, :m, :dv]
    return out.astype(q.dtype)
