"""Kernel-level flash-attention tile microbench (real chip).

Completes VERDICT r4 #8's shape list: the UNet-level sweep (tools/ab_sdxl.py)
covers the SDXL step's 4096/1024-token attention sites, but the 16384-token
site lives in the (SD1.5 and SDXL) VAE decoder mid-block — 1 head, d=512,
128x128 latents — and in any future long-context use of the packed kernel.
This times flash_attention_packed / flash_attention DIRECTLY over (block_m,
block_n) tiles at both sequence lengths, so the tile story is measured at
every shape class the framework runs, not just where a full-model A/B exists.

Note the kernel clamps tiles to its VMEM budget (flash_attention.py
vmem_est), so some labels alias the same effective config — each row prints
the bytes-derived effective tile when it differs.

Methodology per docs/tpu_notes.md: warmup forced by a readback, then n
chained calls ended by one forcing readback. Same-hour rows only.

Usage: python tools/ab_flash_tiles.py [--tiny]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from onnxstream_tpu.utils.compile_cache import setup_repo_compile_cache  # noqa: E402

setup_repo_compile_cache()

import numpy as np

# (name, seq, heads, d, tiles) — seq 4096 @ d=64 is the SDXL step's main
# site; 16384 @ d=64 is the long-context probe at the same head shape;
# 16384 @ 1 head d=512 is the VAE decoder mid-block (unpacked path).
CASES = [
    ("sdxl4k", 4096, 10, 64),
    ("long16k", 16384, 10, 64),
    ("vae16k", 16384, 1, 512),
]
TILES = [(512, 1024), (1024, 1024), (1024, 2048), (2048, 1024)]


def main() -> None:
    tiny = "--tiny" in sys.argv
    n_iter = int(os.environ.get("OSTPU_SWEEP_ITERS", "30"))

    import jax
    import jax.numpy as jnp

    from onnxstream_tpu.kernels.flash_attention import (flash_attention,
                                                        flash_attention_packed)

    interpret = jax.default_backend() != "tpu"
    rng = np.random.RandomState(0)
    for name, seq, heads, d in CASES:
        if tiny:
            seq, d = max(seq // 64, 128), min(d, 64)
        q = jnp.asarray(rng.randn(1, seq, heads * d) * 0.1, jnp.bfloat16)
        k = jnp.asarray(rng.randn(1, seq, heads * d) * 0.1, jnp.bfloat16)
        v = jnp.asarray(rng.randn(1, seq, heads * d) * 0.1, jnp.bfloat16)
        qh = q.reshape(1, seq, heads, d).transpose(0, 2, 1, 3)
        kh = k.reshape(1, seq, heads, d).transpose(0, 2, 1, 3)
        vh = v.reshape(1, seq, heads, d).transpose(0, 2, 1, 3)
        tiles = [(max(bm // 32, 16), max(bn // 8, 128)) for bm, bn in TILES] \
            if tiny else TILES
        for bm, bn in tiles:

            if heads == 1:
                # the VAE site runs the unpacked kernel (1 head, wide d)
                def call(bm=bm, bn=bn):
                    return flash_attention(qh, kh, vh, block_m=bm, block_n=bn,
                                           interpret=interpret)
            else:
                def call(bm=bm, bn=bn):
                    return flash_attention_packed(q, k, v, heads, block_m=bm,
                                                  block_n=bn,
                                                  interpret=interpret)

            f = jax.jit(call)
            out = f()
            np.asarray(jax.tree_util.tree_leaves(out)[0][(0,) * out.ndim])
            t0 = time.time()
            for _ in range(n_iter):
                out = f()
            np.asarray(jax.tree_util.tree_leaves(out)[0][(0,) * out.ndim])
            dt_ms = (time.time() - t0) / n_iter * 1e3
            print(json.dumps({"case": name, "seq": seq, "heads": heads,
                              "d": d, "block_m": bm, "block_n": bn,
                              "ms": round(dt_ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
