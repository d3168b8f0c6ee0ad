"""Microbench: fused gn_silu_conv Pallas kernel vs XLA composite, real chip.

Times one GroupNorm+affine+SiLU+Conv3x3 chain at the SD1.5 UNet resnet
shapes (O=C so calls chain output->input), methodology per docs/tpu_notes.md:
warmup forced by a readback, then n chained device-resident calls ended by
one readback. The composite baseline is what XLA makes of the decomposed
chain — the same program the session runs when the fusion flag is off.

Usage: python tools/ab_gnconv.py [case ...]   (cases: 8x8 16x16 32x32 64x64)
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ostpu_jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CASES = {
    "8x8": (1, 1280, 32, 8, 8),
    "16x16": (1, 1280, 32, 16, 16),
    "32x32": (1, 640, 32, 32, 32),
    "64x64": (1, 320, 32, 64, 64),
}


def main() -> None:
    sel = [a for a in sys.argv[1:] if not a.startswith("-")] or list(CASES)
    n_iter = int(os.environ.get("OSTPU_SWEEP_ITERS", "100"))

    import jax
    import jax.numpy as jnp

    from onnxstream_tpu.kernels.gn_conv import (
        gn_silu_conv_pallas,
        gn_silu_conv_reference,
        oihw_to_w9,
    )

    rng = np.random.RandomState(0)
    for name in sel:
        n, c, g, h, w = CASES[name]
        o = c
        x = jnp.asarray(rng.randn(n, c, h, w).astype(np.float32), jnp.bfloat16)
        sg = jnp.ones((g,), jnp.float32)
        sb = jnp.zeros((g,), jnp.float32)
        gamma = jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)
        beta = jnp.asarray(0.1 * rng.randn(c).astype(np.float32))
        wt = (0.05 * rng.randn(o, c, 3, 3)).astype(np.float32)
        w9 = jnp.asarray(oihw_to_w9(wt), jnp.bfloat16)
        bias = jnp.asarray(0.1 * rng.randn(o).astype(np.float32))

        fused = jax.jit(
            lambda xx: gn_silu_conv_pallas(
                xx, sg, sb, gamma, beta, w9, bias, groups=g, eps=1e-5
            )
        )
        comp = jax.jit(
            lambda xx: gn_silu_conv_reference(
                xx, sg, sb, gamma, beta, w9, bias, g, 1e-5
            )
        )

        res = {"case": name, "shape": [n, c, h, w]}
        ref = None
        for tag, fn in (("xla_ms", comp), ("pallas_ms", fused)):
            y = fn(x)
            probe = np.asarray(y, np.float32)
            if ref is None:
                ref = probe
            else:
                res["max_dev"] = round(float(np.abs(probe - ref).max()), 4)
            # the chained loop lives INSIDE one program: per-launch overhead
            # over the tunnel (~0.3-0.5 ms) would otherwise dominate these
            # sub-ms ops (first microbench run measured XLA at 3-6 TF/s when
            # the in-UNet rate is ~26 TF/s)
            body = jax.jit(
                lambda xx: jax.lax.fori_loop(0, n_iter, lambda i, v: fn(v), xx)
            )
            np.asarray(body(x))  # warmup (compile)
            t0 = time.time()
            np.asarray(body(x))
            res[tag] = round((time.time() - t0) / n_iter * 1e3, 3)
        flops = 2 * n * h * w * c * o * 9
        res["pallas_tflops"] = round(flops / (res["pallas_ms"] / 1e3) / 1e12, 1)
        res["xla_tflops"] = round(flops / (res["xla_ms"] / 1e3) / 1e12, 1)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
