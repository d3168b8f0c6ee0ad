"""Fused scaled-dot-product attention ops.

The reference has two attention accelerations that we subsume with one op:

  * `AttentionFusedOps` — MatMul[+Mul(scale)]+Softmax+MatMul collapsed and
    executed in Q-row slices so the (heads, q, kv) matrix never materializes
    (reference src/onnxstream.cpp:3576-3633 recognizer, 6696-6928 executor);
  * `ScaledDotProductAttention` — the LLM-shaped fusions mapped to XNNPACK's
    flash-style kernel with GQA + additive mask (src/onnxstream.cpp:3635-3755
    recognizers, 7767-7882 executor).

Both become the internal op ``ostpu.sdpa`` here: the graph fusion pass
(onnxstream_tpu/runtime/fusion.py) rewrites the recognized patterns, and this
impl dispatches to a blockwise Pallas flash-attention kernel on TPU
(onnxstream_tpu/kernels/flash_attention.py) or a jnp reference path elsewhere.
The blockwise kernel makes the reference's `m_attention_fused_ops_parts`
slicing knob unnecessary: memory is bounded by the block size by construction.

Canonical signature:
    inputs:  Q (..., H, M, D), K (..., Hkv, N, D), V (..., Hkv, N, Dv), mask?
    attrs:   scale (float, default 1/sqrt(D)), k_transposed (K given as
             (..., Hkv, D, N)), causal (0/1)
GQA: H may be a multiple of Hkv (reference src/onnxstream.cpp:7791-7797).
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from onnxstream_tpu.ops import Ctx, register


def sdpa_reference(q, k, v, mask=None, scale=None, k_transposed=False, causal=False):
    """jnp reference SDPA with float32 softmax and GQA support."""
    if k_transposed:
        k = jnp.swapaxes(k, -1, -2)  # -> (..., N, D)
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])

    h_q = q.shape[-3] if q.ndim >= 3 else 1
    h_kv = k.shape[-3] if k.ndim >= 3 else 1
    if q.ndim >= 3 and h_q != h_kv:
        if h_q % h_kv:
            raise ValueError(f"GQA requires q_heads % kv_heads == 0, got {h_q} vs {h_kv}")
        rep = h_q // h_kv
        k = jnp.repeat(k, rep, axis=-3)
        v = jnp.repeat(v, rep, axis=-3)

    # scores stay in the compute dtype (the fp32 work happens inside a fused
    # cast->softmax->cast island, like the unfused Softmax op) — an fp32
    # score materialization would double the dominant HBM traffic. The scale
    # folds into q BEFORE the matmul so raw fp16 dot products cannot
    # overflow 65504.
    # fp32 inputs take true-fp32 MXU passes (parity with the op library's
    # _mxu_precision policy); default TPU einsum would run bf16 passes
    prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    q = q * jnp.asarray(scale, q.dtype)
    logits = jnp.einsum("...md,...nd->...mn", q, k, precision=prec)
    if mask is not None:
        logits = logits + mask.astype(logits.dtype)
    if causal:
        m, n = logits.shape[-2], logits.shape[-1]
        row = jax.lax.broadcasted_iota(jnp.int32, (m, n), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (m, n), 1)
        neg = jnp.asarray(jnp.finfo(logits.dtype).min, logits.dtype)
        logits = jnp.where(col <= row + (n - m), logits, neg)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    out = jnp.einsum("...mn,...nd->...md", probs, v, preferred_element_type=jnp.float32, precision=prec)
    return out.astype(q.dtype)


def sdpa_reference_packed(q, k, v, heads, mask=None, scale=None, causal=False):
    """Packed-projection SDPA: q (..., M, H*D), k/v (..., N, Hkv*D) -> (..., M, H*Dv).

    The head split/merge lives inside the einsums (dot_general batch dims),
    never as Transpose ops. Note XLA still lowers the upstream projection
    dot + head-split reshape into a head-axis convolution; that form
    measures ~0.6 ms/step on the SD1.5 UNet, so this path is about graph
    hygiene, not speed (docs/tpu_notes.md)."""
    lead = q.shape[:-2]
    m, hd = q.shape[-2:]
    d = hd // heads
    n = k.shape[-2]
    hkv = k.shape[-1] // d
    dv = v.shape[-1] // hkv
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    q4 = q.reshape(lead + (m, heads, d)) * jnp.asarray(scale, q.dtype)
    k4 = k.reshape(lead + (n, hkv, d))
    v4 = v.reshape(lead + (n, hkv, dv))
    if heads != hkv:
        if heads % hkv:
            raise ValueError(f"GQA requires q_heads % kv_heads == 0, got {heads} vs {hkv}")
        k4 = jnp.repeat(k4, heads // hkv, axis=-2)
        v4 = jnp.repeat(v4, heads // hkv, axis=-2)
    logits = jnp.einsum("...mhd,...nhd->...hmn", q4, k4, precision=prec)
    if mask is not None:
        logits = logits + mask.astype(logits.dtype)
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (m, n), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (m, n), 1)
        neg = jnp.asarray(jnp.finfo(logits.dtype).min, logits.dtype)
        logits = jnp.where(col <= row + (n - m), logits, neg)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    out = jnp.einsum("...hmn,...nhd->...mhd", probs, v4, preferred_element_type=jnp.float32, precision=prec)
    return out.reshape(lead + (m, heads * dv)).astype(q.dtype)


def _use_flash(config, q, k, k_transposed=False) -> bool:
    if config is not None and not getattr(config, "use_flash_attention", True):
        return False
    try:
        import jax

        platform = jax.default_backend()
    except Exception:
        return False
    if platform not in ("tpu",):
        return False
    # head dims are zero-padded to the lane width inside the kernel
    d = q.shape[-1]
    if not (d % 8 == 0 and q.shape[-2] >= 8 and q.ndim in (3, 4)):
        return False
    # per-shape choice, measured on v5e (device timeline, bf16): the
    # blockwise kernel wins once the materialized scores are HBM-bound
    # (h8 s4096 d40: 0.52 vs 0.86 ms; h8 s1024 d80: 0.050 vs 0.066 ms);
    # XLA wins for short-KV / small scores where the kernel's lane padding
    # dominates (cross-attn h8 m4096 n77: 0.015 vs 0.132 ms; s256: 0.012
    # vs 0.018 ms)
    heads = q.shape[-3] if q.ndim >= 3 else 1
    batch = q.shape[0] if q.ndim == 4 else 1
    kv_len = k.shape[-1] if k_transposed else k.shape[-2]
    score_bytes = 2 * batch * heads * q.shape[-2] * kv_len
    return kv_len >= 512 and score_bytes >= (8 << 20)


def _use_flash_packed(config, heads, q, k) -> bool:
    if config is not None and not getattr(config, "use_flash_attention", True):
        return False
    try:
        import jax

        platform = jax.default_backend()
    except Exception:
        return False
    if platform not in ("tpu",):
        return False
    d = q.shape[-1] // heads
    if not (d % 8 == 0 and q.shape[-2] >= 8 and q.ndim in (2, 3)):
        return False
    batch = q.shape[0] if q.ndim == 3 else 1
    kv_len = k.shape[-2]
    score_bytes = 2 * batch * heads * q.shape[-2] * kv_len
    return kv_len >= 512 and score_bytes >= (8 << 20)


def _flash_blocks(config, m: int) -> dict:
    """Flash kernel tile sizes: config pins win; otherwise a shape default.

    At >=2048-token q sequences the q tile rises 512→1024: each grid row
    re-reads the full K/V once, so a taller tile halves K/V HBM re-reads —
    the one flash lever that measured GREEN on the SDXL/SD1.5 4096-token
    steps (docs/tpu_notes.md round-5 sweep: 64.5→63.0 ms SDXL, replicated
    same-hour; block_n above the 1024 default only clamps back under the
    kernel's VMEM budget, and smaller tiles of either kind lose)."""
    blocks = {}
    if getattr(config, "flash_block_m", 0):
        blocks["block_m"] = config.flash_block_m
    elif m >= 2048:
        blocks["block_m"] = 1024
    if getattr(config, "flash_block_n", 0):
        blocks["block_n"] = config.flash_block_n
    return blocks


@register("ostpu.sdpa")
def _sdpa(ctx: Ctx, op, ins):
    q, k, v = ins[0], ins[1], ins[2]
    mask = ins[3] if len(ins) > 3 and ins[3] is not None else None
    scale = op.attr_float("scale", 0.0) or None
    k_transposed = bool(op.attr_int("k_transposed", 0))
    causal = bool(op.attr_int("causal", 0))
    heads = op.attr_int("heads", 0)

    # sweepable kernel tile sizes (0 = shape defaults; tools/ab_sdxl.py)
    blocks = _flash_blocks(ctx.config, q.shape[-2])

    if heads:
        # packed projections (fusion absorbed the head split/merge)
        if scale is None:
            scale = 1.0 / math.sqrt(q.shape[-1] // heads)
        if mask is None and _use_flash_packed(ctx.config, heads, q, k):
            from onnxstream_tpu.kernels.flash_attention import flash_attention_packed

            try:
                return [flash_attention_packed(
                    q, k, v, heads, scale=scale, causal=causal,
                    nopad=bool(getattr(ctx.config, "flash_packed_nopad", False)),
                    **blocks,
                )]
            except NotImplementedError:
                pass
        return [sdpa_reference_packed(q, k, v, heads, mask=mask, scale=scale, causal=causal)]

    if _use_flash(ctx.config, q, k, k_transposed):
        from onnxstream_tpu.kernels.flash_attention import flash_attention

        try:
            return [
                flash_attention(
                    q, k, v, mask=mask, scale=scale, k_transposed=k_transposed,
                    causal=causal, **blocks,
                )
            ]
        except NotImplementedError:
            pass
    return [sdpa_reference(q, k, v, mask=mask, scale=scale, k_transposed=k_transposed, causal=causal)]
