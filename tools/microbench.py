"""Component microbenchmarks for the SD1.5 UNet transformer blocks (perf work).

Times individual compiled pieces at the exact shapes the UNet runs, chained
device-resident per docs/tpu_notes.md (forced warmup readback, N chained
iterations, one forcing readback). Output: one JSON line per case.

Cases (self-attention levels of SD1.5 @64x64 latents):
  sdpa_flash/<L>     Pallas flash kernel at (1,8,M,D): L0=(4096,40) L1=(1024,80) L2=(256,160)
  sdpa_xla/<L>       jnp reference SDPA at the same shapes
  cross_xla/<L>      cross-attention (N=77)
  qkvo/<L>           4 chained (M,C)x(C,C) projection matmuls
  geglu/<L>          ff_in (C->8C) + split + gelu*mul + ff_out (4C->C)
  ln/<L>             LayerNorm at (M,C)
  tblock/<L>         one full transformer block (ln+attn+ln+cross+ln+ff), jitted as one fn
  overhead/n100      100 chained trivial adds (per-dispatched-op overhead probe)

Usage: python tools/microbench.py [case ...]   (default: all)
"""

import functools
import json
import math
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ostpu_jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LEVELS = {  # level -> (seq M, channels C, heads, head dim)
    "L0": (4096, 320, 8, 40),
    "L1": (1024, 640, 8, 80),
    "L2": (256, 1280, 8, 160),
}
CTX = 77
CROSS_D = 768
DT = "bfloat16"


def _chain_time(fn, args, iters, feedback):
    """Time a jitted fn by chaining: args = (static_args..., x); feedback maps
    output -> next x. Ends with one forcing readback."""
    import jax

    out = fn(*args)
    x = feedback(out, args)
    out = fn(*x)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]  # force warmup
    t0 = time.time()
    a = x
    for _ in range(iters):
        out = fn(*a)
        a = feedback(out, a)
    np.asarray(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1])
    return (time.time() - t0) / iters * 1e3


def bench_case(name: str, iters: int = 200):
    import jax
    import jax.numpy as jnp

    kind, lvl = (name.split("/") + ["L0"])[:2]
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16

    if kind == "overhead":
        n = 100

        @jax.jit
        def f(x):
            for i in range(n):
                x = x + jnp.float32(1.0) if False else x * jnp.bfloat16(1.0001)
            return x

        x = jnp.asarray(rng.rand(128, 128), dt)
        ms = _chain_time(f, (x,), iters, lambda o, a: (o,))
        print(json.dumps({"case": name, "ms": round(ms, 4), "per_op_us": round(ms * 1e3 / n, 2)}), flush=True)
        return

    m, c, h, d = LEVELS[lvl]

    if kind in ("sdpa_flash", "sdpa_xla", "sdpa_nopad", "sdpa_bm1024"):
        from onnxstream_tpu.kernels.flash_attention import flash_attention
        from onnxstream_tpu.ops.attention import sdpa_reference

        q = jnp.asarray(rng.rand(1, h, m, d), dt)
        k = jnp.asarray(rng.rand(1, h, m, d), dt)
        v = jnp.asarray(rng.rand(1, h, m, d), dt)
        if kind == "sdpa_xla":
            f = sdpa_reference
        elif kind == "sdpa_nopad":
            f = functools.partial(flash_attention, pad_lanes=False)
        elif kind == "sdpa_bm1024":
            f = functools.partial(flash_attention, block_m=1024, block_n=1024)
        else:
            f = flash_attention
        jf = jax.jit(lambda q, k, v: f(q, k, v))
        ms = _chain_time(jf, (q, k, v), iters, lambda o, a: (o, a[1], a[2]))
        gf = 2 * 2 * h * m * m * d / 1e9
        print(json.dumps({"case": name, "ms": round(ms, 4), "nominal_tflops": round(gf / ms, 1)}), flush=True)
        return

    if kind == "cross_xla":
        from onnxstream_tpu.ops.attention import sdpa_reference

        q = jnp.asarray(rng.rand(1, h, m, d), dt)
        k = jnp.asarray(rng.rand(1, h, CTX, d), dt)
        v = jnp.asarray(rng.rand(1, h, CTX, d), dt)
        jf = jax.jit(lambda q, k, v: sdpa_reference(q, k, v))
        ms = _chain_time(jf, (q, k, v), iters, lambda o, a: (o, a[1], a[2]))
        print(json.dumps({"case": name, "ms": round(ms, 4)}), flush=True)
        return

    if kind == "qkvo":
        ws = [jnp.asarray(rng.rand(c, c) * 0.02, dt) for _ in range(4)]

        @jax.jit
        def f(x, ws):
            for w in ws:
                x = jnp.matmul(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
            return x

        x = jnp.asarray(rng.rand(m, c), dt)
        ms = _chain_time(f, (x, ws), iters, lambda o, a: (o, a[1]))
        gf = 4 * 2 * m * c * c / 1e9
        print(json.dumps({"case": name, "ms": round(ms, 4), "nominal_tflops": round(gf / ms, 1)}), flush=True)
        return

    if kind == "geglu":
        w1 = jnp.asarray(rng.rand(c, c * 8) * 0.02, dt)
        w2 = jnp.asarray(rng.rand(c * 4, c) * 0.02, dt)

        @jax.jit
        def f(x, w1, w2):
            ff = jnp.matmul(x, w1, preferred_element_type=jnp.float32).astype(x.dtype)
            gate, val = ff[:, : c * 4], ff[:, c * 4 :]
            ff = jax.nn.gelu(gate.astype(jnp.float32)).astype(x.dtype) * val
            return jnp.matmul(ff, w2, preferred_element_type=jnp.float32).astype(x.dtype)

        x = jnp.asarray(rng.rand(m, c), dt)
        ms = _chain_time(f, (x, w1, w2), iters, lambda o, a: (o, a[1], a[2]))
        gf = (2 * m * c * 8 * c + 2 * m * 4 * c * c) / 1e9
        print(json.dumps({"case": name, "ms": round(ms, 4), "nominal_tflops": round(gf / ms, 1)}), flush=True)
        return

    if kind == "ln":
        @jax.jit
        def f(x):
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, -1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
            return ((xf - mu) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)

        x = jnp.asarray(rng.rand(m, c), dt)
        ms = _chain_time(f, (x,), iters, lambda o, a: (o,))
        print(json.dumps({"case": name, "ms": round(ms, 4)}), flush=True)
        return

    if kind == "tblock":
        from onnxstream_tpu.kernels.flash_attention import flash_attention
        from onnxstream_tpu.ops.attention import sdpa_reference

        ws = {
            "qkvo1": [jnp.asarray(rng.rand(c, c) * 0.02, dt) for _ in range(4)],
            "q2": jnp.asarray(rng.rand(c, c) * 0.02, dt),
            "k2": jnp.asarray(rng.rand(CROSS_D, c) * 0.02, dt),
            "v2": jnp.asarray(rng.rand(CROSS_D, c) * 0.02, dt),
            "o2": jnp.asarray(rng.rand(c, c) * 0.02, dt),
            "w1": jnp.asarray(rng.rand(c, c * 8) * 0.02, dt),
            "w2": jnp.asarray(rng.rand(c * 4, c) * 0.02, dt),
        }
        ctx = jnp.asarray(rng.rand(CTX, CROSS_D), dt)
        use_flash = m >= 1024

        def ln(x):
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, -1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
            return ((xf - mu) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)

        def heads(x):
            return x.reshape(m, h, d).transpose(1, 0, 2)

        def unheads(x):
            return x.transpose(1, 0, 2).reshape(m, c)

        @jax.jit
        def f(x, ws, ctx):
            a = ln(x)
            q, k, v = (jnp.matmul(a, ws["qkvo1"][i], preferred_element_type=jnp.float32).astype(x.dtype) for i in range(3))
            sd = flash_attention if use_flash else sdpa_reference
            att = sd(heads(q), heads(k), heads(v))
            x = x + jnp.matmul(unheads(att), ws["qkvo1"][3], preferred_element_type=jnp.float32).astype(x.dtype)
            a = ln(x)
            q = jnp.matmul(a, ws["q2"], preferred_element_type=jnp.float32).astype(x.dtype)
            k = jnp.matmul(ctx, ws["k2"], preferred_element_type=jnp.float32).astype(x.dtype)
            v = jnp.matmul(ctx, ws["v2"], preferred_element_type=jnp.float32).astype(x.dtype)
            att = sdpa_reference(
                q.reshape(m, h, d).transpose(1, 0, 2),
                k.reshape(CTX, h, d).transpose(1, 0, 2),
                v.reshape(CTX, h, d).transpose(1, 0, 2),
            )
            x = x + jnp.matmul(unheads(att), ws["o2"], preferred_element_type=jnp.float32).astype(x.dtype)
            a = ln(x)
            ff = jnp.matmul(a, ws["w1"], preferred_element_type=jnp.float32).astype(x.dtype)
            gate, val = ff[:, : c * 4], ff[:, c * 4 :]
            ff = jax.nn.gelu(gate.astype(jnp.float32)).astype(x.dtype) * val
            return x + jnp.matmul(ff, ws["w2"], preferred_element_type=jnp.float32).astype(x.dtype)

        x = jnp.asarray(rng.rand(m, c), dt)
        ms = _chain_time(f, (x, ws, ctx), iters, lambda o, a: (o, a[1], a[2]))
        print(json.dumps({"case": name, "ms": round(ms, 4), "flash": use_flash}), flush=True)
        return

    raise SystemExit(f"unknown case {name}")


ALL = (
    [f"sdpa_flash/{l}" for l in LEVELS]
    + [f"sdpa_xla/{l}" for l in LEVELS]
    + [f"cross_xla/{l}" for l in LEVELS]
    + [f"qkvo/{l}" for l in LEVELS]
    + [f"geglu/{l}" for l in LEVELS]
    + [f"ln/{l}" for l in LEVELS]
    + [f"tblock/{l}" for l in LEVELS]
    + ["overhead/n100"]
)


def main():
    cases = [a for a in sys.argv[1:] if not a.startswith("-")] or ALL
    iters = 200
    for cs in cases:
        try:
            bench_case(cs, iters)
        except Exception as e:
            print(json.dumps({"case": cs, "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
