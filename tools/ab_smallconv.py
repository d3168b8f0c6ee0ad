"""A/B the small-spatial conv formulations on the real chip (perf work).

XLA picks a ~10%-MFU direct NCHW convolution for the SD1.5 mid/up-block 8x8
3x3 convs (docs/tpu_notes.md). Candidate replacements, timed as 50 chained
iterations inside ONE compiled program (so per-program dispatch overhead,
~0.5 ms on the tunneled backend, is amortized away):

  xla      lax.conv_general_dilated, NHWC (the current default path)
  tapsum   sum over the 9 kernel taps of einsum('mc,oc->mo') MXU dots on
           shifted windows — no patch materialization, no weight transpose
           (dot_general contracts w's C dim in place)
  im2col   concat-K patches (NHWC slices, no stack/transpose) + one dot

Each case: y = conv(x) repeatedly (channels preserved, 3x3 s1 p1) with the
output fed back as the next input. Cases where Cin != Cout chain via a
1x1-projection-free trick: feed y through the same conv after duplicating
channels is NOT representative, so those shapes run the conv on a fixed x
50 times with a data dependence via x + eps*mean(y).

Usage: python tools/ab_smallconv.py [shape ...]   shapes: mid8, up8, l2_16, conv_in
"""

import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ostpu_jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    # sitecustomize registers the axon TPU plugin before we run; env vars
    # alone are too late (tests/conftest.py) — force through jax.config.
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

DT = "bfloat16"
SHAPES = {
    # name -> (Cin, Cout, H, W)
    "mid8": (1280, 1280, 8, 8),
    "up8": (2560, 1280, 8, 8),
    "l2_16": (1280, 1280, 16, 16),
    "conv_in": (4, 320, 64, 64),
}
ITERS = 50


def conv_xla(x, w):
    import jax.numpy as jnp
    from jax import lax

    xt = jnp.transpose(x, (0, 2, 3, 1))
    dn = lax.conv_dimension_numbers(xt.shape, w.shape, ("NHWC", "OIHW", "NHWC"))
    y = lax.conv_general_dilated(
        xt, w, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=dn, preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return jnp.transpose(y, (0, 3, 1, 2))


def conv_tapsum(x, w):
    import jax.numpy as jnp

    n, c, h, wd = x.shape
    o = w.shape[0]
    xt = jnp.transpose(x, (0, 2, 3, 1))
    xp = jnp.pad(xt, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for i in range(3):
        for j in range(3):
            a2 = xp[:, i : i + h, j : j + wd, :].reshape(n * h * wd, c)
            yy = jnp.einsum(
                "mc,oc->mo", a2, w[:, :, i, j], preferred_element_type=jnp.float32
            )
            acc = yy if acc is None else acc + yy
    return acc.astype(x.dtype).reshape(n, h, wd, o).transpose(0, 3, 1, 2)


def conv_im2col(x, w):
    import jax.numpy as jnp

    n, c, h, wd = x.shape
    o = w.shape[0]
    xt = jnp.transpose(x, (0, 2, 3, 1))
    xp = jnp.pad(xt, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [
        xp[:, i : i + h, j : j + wd, :].reshape(n * h * wd, c)
        for i in range(3)
        for j in range(3)
    ]
    a2 = jnp.concatenate(cols, axis=1)  # (M, 9C), tap-major
    w2 = jnp.transpose(w, (2, 3, 1, 0)).reshape(9 * c, o)
    y = jnp.matmul(a2, w2, preferred_element_type=jnp.float32)
    return y.astype(x.dtype).reshape(n, h, wd, o).transpose(0, 3, 1, 2)


def conv_pallas(x, w):
    """im2col + the opaque Pallas MXU matmul (kernels/matmul.py) — the one
    formulation XLA cannot rewrite back into its own conv schedule."""
    import jax.numpy as jnp

    from onnxstream_tpu.kernels.matmul import conv3x3_im2col_pallas

    xt = jnp.transpose(x, (0, 2, 3, 1))
    y = conv3x3_im2col_pallas(xt, w)
    return jnp.transpose(y, (0, 3, 1, 2))


def run_case(shape_name, fn_name, fn):
    import jax
    import jax.numpy as jnp

    cin, cout, h, wd = SHAPES[shape_name]
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(1, cin, h, wd).astype(np.float32), DT)
    w0 = jnp.asarray(0.02 * rng.randn(cout, cin, 3, 3).astype(np.float32), DT)

    same = cin == cout

    @jax.jit
    def chained(x, w):
        def body(i, xx):
            y = fn(xx, w)
            if same:
                return y
            # keep a data dependence without changing shapes
            return xx + jnp.mean(y).astype(xx.dtype)

        return jax.lax.fori_loop(0, ITERS, body, x)

    y = chained(x0, w0)
    np.asarray(y.ravel()[:1])  # force warmup (compile + program load)
    t0 = time.time()
    y = chained(x0, w0)
    np.asarray(y.ravel()[:1])
    per_ms = (time.time() - t0) / ITERS * 1e3
    flops = 2 * h * wd * cin * cout * 9
    print(
        json.dumps(
            {
                "case": f"{fn_name}/{shape_name}",
                "ms": round(per_ms, 4),
                "tflops": round(flops / per_ms / 1e9, 1),
            }
        ),
        flush=True,
    )


def main():
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or list(SHAPES)
    # correctness probe on one shape first (CPU-friendly tolerance in bf16)
    import jax.numpy as jnp

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 32, 8, 8).astype(np.float32))
    w = jnp.asarray(0.1 * rng.randn(16, 32, 3, 3).astype(np.float32))
    SHAPES["probe"] = (32, 16, 8, 8)
    ref = np.asarray(conv_xla(x, w), np.float32)
    for nm, f in (("tapsum", conv_tapsum), ("im2col", conv_im2col)):
        got = np.asarray(f(x, w), np.float32)
        err = np.abs(got - ref).max()
        assert err < 1e-3, (nm, err)
    del SHAPES["probe"]
    print(json.dumps({"case": "correctness", "ok": True}), flush=True)

    for s in names:
        for fn_name, fn in (
            ("xla", conv_xla),
            ("tapsum", conv_tapsum),
            ("im2col", conv_im2col),
        ):
            run_case(s, fn_name, fn)


if __name__ == "__main__":
    main()
