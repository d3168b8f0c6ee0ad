"""SDPA correctness tests.

CPU suite: the jnp reference path vs a float64 numpy oracle (fast).
TPU suite: the Pallas kernel vs the same oracle — enabled with
OSTPU_TPU_TESTS=1 (run via `JAX_PLATFORMS=axon OSTPU_TPU_TESTS=1 python -m
pytest tests/test_flash_attention.py`); Pallas interpret mode on this 1-core
host takes ~8 min/case, so it is not used.
"""

import math
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from onnxstream_tpu.ops.attention import sdpa_reference

TPU_TESTS = os.environ.get("OSTPU_TPU_TESTS", "") == "1" and jax.default_backend() == "tpu"


def oracle(q, k, v, mask=None, scale=None, causal=False):
    q, k, v = (np.asarray(x, np.float64) for x in (q, k, v))
    h, hkv = q.shape[1], k.shape[1]
    if h != hkv:
        k = np.repeat(k, h // hkv, axis=1)
        v = np.repeat(v, h // hkv, axis=1)
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    s = np.einsum("bhmd,bhnd->bhmn", q, k) * scale
    if mask is not None:
        s = s + np.asarray(mask, np.float64)
    if causal:
        m, n = s.shape[-2:]
        s = np.where(np.arange(n)[None, :] <= np.arange(m)[:, None] + (n - m), s, -1e30)
    s = s - s.max(-1, keepdims=True)
    p = np.exp(s)
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhmn,bhnd->bhmd", p, v)


CASES = [
    # b, h, hkv, m, n, d, dv, mask, causal
    ("basic", 1, 2, 2, 128, 128, 64, 64, None, False),
    ("multiblock", 1, 2, 2, 192, 384, 64, 64, None, False),
    ("unaligned", 1, 3, 3, 77, 391, 40, 40, None, False),
    ("gqa", 1, 8, 2, 64, 256, 32, 32, None, False),
    ("mask2d", 1, 2, 2, 70, 260, 64, 64, "2d", False),
    ("maskB", 2, 4, 4, 64, 130, 64, 64, "b", False),
    ("causal", 1, 2, 2, 128, 128, 64, 64, None, True),
    ("decode", 1, 4, 4, 8, 136, 64, 64, None, True),
]


def _mk(case):
    name, b, h, hkv, m, n, d, dv, mask_kind, causal = case
    rng = np.random.RandomState(42)
    q = rng.randn(b, h, m, d).astype(np.float32)
    k = rng.randn(b, hkv, n, d).astype(np.float32)
    v = rng.randn(b, hkv, n, dv).astype(np.float32)
    mask = None
    if mask_kind == "2d":
        mask = np.where(rng.rand(m, n) > 0.3, 0.0, -1e30).astype(np.float32)
        mask[:, 0] = 0.0
    elif mask_kind == "b":
        mask = np.where(rng.rand(b, 1, m, n) > 0.3, 0.0, -1e30).astype(np.float32)
        mask[..., 0] = 0.0
    return q, k, v, mask, causal


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_sdpa_reference_vs_oracle(case):
    q, k, v, mask, causal = _mk(case)
    ref = oracle(q, k, v, mask=mask, causal=causal)
    out = sdpa_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        mask=None if mask is None else jnp.asarray(mask), causal=causal,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_sdpa_k_transposed():
    rng = np.random.RandomState(2)
    q = rng.randn(2, 64, 32).astype(np.float32)
    kt = rng.randn(2, 32, 96).astype(np.float32)
    v = rng.randn(2, 96, 32).astype(np.float32)
    ref = oracle(q[None], kt.transpose(0, 2, 1)[None], v[None])[0]
    out = sdpa_reference(jnp.asarray(q), jnp.asarray(kt), jnp.asarray(v), k_transposed=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not TPU_TESTS, reason="set OSTPU_TPU_TESTS=1 on a TPU backend")
@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_flash_kernel_vs_oracle_tpu(case):
    from onnxstream_tpu.kernels.flash_attention import flash_attention

    q, k, v, mask, causal = _mk(case)
    ref = oracle(q, k, v, mask=mask, causal=causal)
    out = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        mask=None if mask is None else jnp.asarray(mask), causal=causal,
        block_m=64, block_n=128,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def _pack(x):
    """(b, h, l, d) -> packed (b, l, h*d)."""
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_sdpa_reference_packed_vs_oracle(case):
    from onnxstream_tpu.ops.attention import sdpa_reference_packed

    q, k, v, mask, causal = _mk(case)
    h = q.shape[1]
    ref = _pack(oracle(q, k, v, mask=mask, causal=causal))
    out = sdpa_reference_packed(
        jnp.asarray(_pack(q)), jnp.asarray(_pack(k)), jnp.asarray(_pack(v)), h,
        mask=None if mask is None else jnp.asarray(mask), causal=causal,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not TPU_TESTS, reason="set OSTPU_TPU_TESTS=1 on a TPU backend")
@pytest.mark.parametrize(
    "case", [c for c in CASES if c[8] is None], ids=[c[0] for c in CASES if c[8] is None]
)
def test_flash_kernel_packed_vs_oracle_tpu(case):
    from onnxstream_tpu.kernels.flash_attention import flash_attention_packed

    q, k, v, mask, causal = _mk(case)
    h = q.shape[1]
    ref = _pack(oracle(q, k, v, causal=causal))
    out = flash_attention_packed(
        jnp.asarray(_pack(q)), jnp.asarray(_pack(k)), jnp.asarray(_pack(v)), h,
        causal=causal, block_m=64, block_n=128,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def test_sdpa_reference_fp16_no_overflow():
    """fp16 compute: the scale folds into q BEFORE the matmul, so raw dot
    products cannot exceed the fp16 max (review finding: post-matmul scaling
    overflowed to inf -> NaN softmax)."""
    import jax.numpy as jnp
    import numpy as np

    from onnxstream_tpu.ops.attention import sdpa_reference

    rng = np.random.RandomState(0)
    # values large enough that q.k in fp16 would overflow without pre-scaling
    q = jnp.asarray(rng.rand(1, 2, 8, 128) * 16, jnp.float16)
    k = jnp.asarray(rng.rand(1, 2, 8, 128) * 16, jnp.float16)
    v = jnp.asarray(rng.rand(1, 2, 8, 16), jnp.float16)
    out = np.asarray(sdpa_reference(q, k, v, causal=True), np.float32)
    assert np.isfinite(out).all()


@pytest.mark.skipif(not TPU_TESTS, reason="set OSTPU_TPU_TESTS=1 on a TPU backend")
@pytest.mark.parametrize(
    "case", [c for c in CASES if c[8] is None], ids=[c[0] for c in CASES if c[8] is None]
)
def test_flash_kernel_packed_nopad_vs_oracle_tpu(case):
    """nopad=True routes non-lane-aligned head dims through the head-major
    unpadded kernel (pad_lanes=False); lane-aligned dims keep the packed
    path. Either way the numbers must match the oracle."""
    from onnxstream_tpu.kernels.flash_attention import flash_attention_packed

    q, k, v, mask, causal = _mk(case)
    h = q.shape[1]
    ref = _pack(oracle(q, k, v, causal=causal))
    out = flash_attention_packed(
        jnp.asarray(_pack(q)), jnp.asarray(_pack(k)), jnp.asarray(_pack(v)), h,
        causal=causal, block_m=64, block_n=128, nopad=True,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def test_flash_block_shape_defaults():
    """Tile defaults: config pins win; unpinned long-q sequences (>=2048)
    raise block_m 512->1024 (the measured round-5 lever, docs/tpu_notes.md);
    short sequences keep the kernel defaults."""
    from onnxstream_tpu.ops.attention import _flash_blocks
    from onnxstream_tpu.runtime.config import SessionConfig

    cfg = SessionConfig()
    assert _flash_blocks(cfg, 1024) == {}
    assert _flash_blocks(cfg, 2048) == {"block_m": 1024}
    assert _flash_blocks(cfg, 4096) == {"block_m": 1024}
    pinned = SessionConfig(flash_block_m=256, flash_block_n=512)
    assert _flash_blocks(pinned, 4096) == {"block_m": 256, "block_n": 512}


def test_flash_rank3_mask_accepted():
    """(B, M, N) / (1, M, N) additive masks are a valid ONNX broadcast; the
    wrapper must lift them to (B, 1, M, N) rather than crash unpacking —
    a ValueError here escaped the sdpa dispatcher's NotImplementedError
    fallback and killed the whole run (round-5 review find)."""
    from onnxstream_tpu.kernels.flash_attention import flash_attention

    q = jax.ShapeDtypeStruct((2, 4, 8, 16), jnp.float32)
    for mshape in ((2, 8, 8), (1, 8, 8)):
        m = jax.ShapeDtypeStruct(mshape, jnp.float32)
        out = jax.eval_shape(lambda q_, m_: flash_attention(q_, q_, q_, mask=m_), q, m)
        assert out.shape == (2, 4, 8, 16)
    # unsupported ranks must raise NotImplementedError (the dispatcher's
    # einsum-fallback contract), not ValueError
    m5 = jax.ShapeDtypeStruct((1, 1, 1, 8, 8), jnp.float32)
    with pytest.raises(NotImplementedError):
        jax.eval_shape(lambda q_, m_: flash_attention(q_, q_, q_, mask=m_), q, m5)


def test_flash_causal_zero_valid_rows_are_zero():
    """causal with m > n (offset < 0): rows past the last key have ZERO
    valid columns. Every score is then exactly the NEG_INF sentinel — which
    equals the running-max init, so exp2(s - m) was uniformly 1 and the
    output silently became mean(V) (round-5 review find). Fixed rows must
    be exactly 0 (the flash convention); valid rows must match the oracle."""
    from onnxstream_tpu.kernels.flash_attention import flash_attention

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.rand(1, 1, 8, 8).astype(np.float32))
    k = jnp.asarray(rng.rand(1, 1, 4, 8).astype(np.float32))
    v = jnp.asarray(rng.rand(1, 1, 4, 8).astype(np.float32))
    out = np.asarray(flash_attention(q, k, v, causal=True, block_m=8,
                                     block_n=128, interpret=True))
    # offset = n - m = -4: rows 0..3 see no keys (col <= row - 4 never holds)
    assert np.abs(out[0, 0, :4]).max() == 0.0
    # row 7 sees all 4 keys: plain softmax attention over them
    s = (q[0, 0, 7] @ np.asarray(k)[0, 0].T) / np.sqrt(8.0)
    p = np.exp(s - s.max()); p /= p.sum()
    np.testing.assert_allclose(out[0, 0, 7], p @ np.asarray(v)[0, 0],
                               rtol=2e-5, atol=2e-5)
