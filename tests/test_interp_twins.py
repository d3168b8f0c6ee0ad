"""Algorithm twins for api/interp.js's op kernels, tested against numpy.

The shipped JS now ALSO executes directly in CI through the embedded minijs
engine (tests/test_interp_js_exec.py) — these twins remain as the
fine-grained per-kernel layer: each function below is a *faithful
line-by-line port* of the corresponding interp.js kernel — same loop
structure, same index arithmetic, same odometer carries, same bounds math —
validated here against numpy oracles on adversarial shapes (paddings,
strides, groups, broadcasts, negative slice indices). A logic bug in the JS
(wrong stride, off-by-one bound, bad carry) is by construction reproduced in
the twin and caught by the oracle, with a smaller repro than the end-to-end
graph runs give.

Ports intentionally preserve JS-isms (explicit odometers, precomputed ox
bounds, row accumulators) rather than vectorizing — vectorizing would test
numpy, not the algorithm. When editing interp.js kernels, update the twin.
"""

import math

import numpy as np
import pytest


# --------------------------------------------------------- twins (from JS)

def row_strides(shape):
    st = [0] * len(shape)
    acc = 1
    for i in range(len(shape) - 1, -1, -1):
        st[i] = acc
        acc *= shape[i]
    return st


def op_conv(x, w, b, group=1, strides=(1, 1), dilations=(1, 1), pads=(0, 0, 0, 0)):
    N, C, H, W = x.shape
    OC, ICg, KH, KW = w.shape
    g = group
    sh, sw = strides
    dh, dw = dilations
    pt, pl, pb, pr = pads
    assert C == ICg * g
    OH = (H + pt + pb - dh * (KH - 1) - 1) // sh + 1
    OW = (W + pl + pr - dw * (KW - 1) - 1) // sw + 1
    OCg = OC // g
    out = np.zeros(N * OC * OH * OW, np.float32)
    xd, wd = x.ravel(), w.ravel()
    bd = b.ravel() if b is not None else None
    row = np.zeros(OW, np.float64)
    for n in range(N):
        for oc in range(OC):
            g_ = oc // OCg
            bias = bd[oc] if bd is not None else 0.0
            for oy in range(OH):
                row[:] = bias
                iy0 = oy * sh - pt
                for icg in range(ICg):
                    ic = g_ * ICg + icg
                    for ky in range(KH):
                        iy = iy0 + ky * dh
                        if iy < 0 or iy >= H:
                            continue
                        x_base = ((n * C + ic) * H + iy) * W
                        w_base = ((oc * ICg + icg) * KH + ky) * KW
                        for kx in range(KW):
                            wv = wd[w_base + kx]
                            xoff = kx * dw - pl
                            lo = max(0, math.ceil(-xoff / sw))
                            hi = min(OW, math.ceil((W - xoff) / sw))
                            for ox in range(lo, hi):
                                row[ox] += wv * xd[x_base + ox * sw + xoff]
                out[((n * OC + oc) * OH + oy) * OW:
                    ((n * OC + oc) * OH + oy) * OW + OW] = row.astype(np.float32)
    return out.reshape(N, OC, OH, OW)


def op_maxpool(x, kernel, strides, pads):
    N, C, H, W = x.shape
    kh, kw = kernel
    sh, sw = strides
    pt, pl, pb, pr = pads
    OH = (H + pt + pb - kh) // sh + 1
    OW = (W + pl + pr - kw) // sw + 1
    out = np.empty(N * C * OH * OW, np.float32)
    xd = x.ravel()
    for nc in range(N * C):
        x_base, o_base = nc * H * W, nc * OH * OW
        for oy in range(OH):
            for ox in range(OW):
                m = -np.inf
                iy0, ix0 = oy * sh - pt, ox * sw - pl
                for ky in range(kh):
                    iy = iy0 + ky
                    if iy < 0 or iy >= H:
                        continue
                    for kx in range(kw):
                        ix = ix0 + kx
                        if ix < 0 or ix >= W:
                            continue
                        v = xd[x_base + iy * W + ix]
                        if v > m:
                            m = v
                out[o_base + oy * OW + ox] = m
    return out.reshape(N, C, OH, OW)


def op_binary_broadcast(a, b, fn):
    """The generic (non-fast-path) broadcast odometer from opBinary."""
    sa_in, sb_in = list(a.shape), list(b.shape)
    n = max(len(sa_in), len(sb_in))
    shape = []
    for i in range(n):
        da = sa_in[len(sa_in) - n + i] if len(sa_in) - n + i >= 0 else 1
        db = sb_in[len(sb_in) - n + i] if len(sb_in) - n + i >= 0 else 1
        assert da == db or da == 1 or db == 1
        shape.append(max(da, db))
    total = int(np.prod(shape))
    pad = lambda sh: [1] * (n - len(sh)) + sh
    sa, sb = pad(sa_in), pad(sb_in)
    sta, stb = row_strides(sa), row_strides(sb)
    for i in range(n):
        if sa[i] == 1:
            sta[i] = 0
        if sb[i] == 1:
            stb[i] = 0
    out = np.empty(total, np.float32)
    ad, bd = a.ravel(), b.ravel()
    idx = [0] * n
    ia = ib = 0
    for o in range(total):
        out[o] = fn(ad[ia], bd[ib])
        for d in range(n - 1, -1, -1):
            idx[d] += 1
            ia += sta[d]
            ib += stb[d]
            if idx[d] < shape[d]:
                break
            idx[d] = 0
            ia -= shape[d] * sta[d]
            ib -= shape[d] * stb[d]
    return out.reshape(shape)


def op_transpose(x, perm):
    n = x.ndim
    if perm is None:
        perm = list(range(n - 1, -1, -1))
    out_shape = [x.shape[p] for p in perm]
    in_st = row_strides(list(x.shape))
    perm_st = [in_st[p] for p in perm]
    total = int(np.prod(out_shape))
    out = np.empty(total, x.dtype)
    xd = x.ravel()
    idx = [0] * n
    ii = 0
    for o in range(total):
        out[o] = xd[ii]
        for d in range(n - 1, -1, -1):
            idx[d] += 1
            ii += perm_st[d]
            if idx[d] < out_shape[d]:
                break
            idx[d] = 0
            ii -= out_shape[d] * perm_st[d]
    return out.reshape(out_shape)


def op_slice(x, starts, ends, axes, steps=None):
    n = x.ndim
    st = [0] * n
    en = list(x.shape)
    sp = [1] * n
    for i in range(len(starts)):
        ax = axes[i] if axes is not None else i
        if ax < 0:
            ax += n
        d = x.shape[ax]
        step = steps[i] if steps is not None else 1
        if step == 0:
            raise ValueError("Slice: step 0")
        s, e = starts[i], ends[i]
        if s < 0:
            s += d
        if e < 0:
            e += d
        if step > 0:
            st[ax] = min(max(s, 0), d)
            en[ax] = min(max(e, 0), d)
        else:
            st[ax] = min(max(s, 0), d - 1)
            raw_e = ends[i]
            en[ax] = min(max(-1 if (raw_e < 0 and raw_e + d < 0) else e, -1), d - 1)
        sp[ax] = step
    out_shape = [max(-(-(en[i] - st[i]) // sp[i]) if sp[i] > 0
                     else max(int(np.ceil((en[i] - st[i]) / sp[i])), 0), 0)
                 for i in range(n)]
    in_st = row_strides(list(x.shape))
    total = int(np.prod(out_shape))
    out = np.empty(total, x.dtype)
    xd = x.ravel()
    if total == 0:
        return out.reshape(out_shape)
    if all(v == 1 for v in sp):
        idx = [0] * n
        base = sum(s * in_st[i] for i, s in enumerate(st))
        last_len = out_shape[n - 1]
        o = 0
        while o < total:
            out[o:o + last_len] = xd[base:base + last_len]
            for d in range(n - 2, -1, -1):
                idx[d] += 1
                base += in_st[d]
                if idx[d] < out_shape[d]:
                    break
                idx[d] = 0
                base -= out_shape[d] * in_st[d]
            o += last_len
        return out.reshape(out_shape)
    idx = [0] * n
    for o in range(total):
        base = sum((st[d] + idx[d] * sp[d]) * in_st[d] for d in range(n))
        out[o] = xd[base]
        for d in range(n - 1, -1, -1):
            idx[d] += 1
            if idx[d] < out_shape[d]:
                break
            idx[d] = 0
    return out.reshape(out_shape)


def op_resize_nearest(x, scales):
    N, C, H, W = x.shape
    OH, OW = int(H * scales[2]), int(W * scales[3])
    out = np.empty(N * C * OH * OW, np.float32)
    map_y = [min(int(oy / scales[2]), H - 1) for oy in range(OH)]
    map_x = [min(int(ox / scales[3]), W - 1) for ox in range(OW)]
    xd = x.ravel()
    for nc in range(N * C):
        x_base, o_base = nc * H * W, nc * OH * OW
        for oy in range(OH):
            ib = x_base + map_y[oy] * W
            ob = o_base + oy * OW
            for ox in range(OW):
                out[ob + ox] = xd[ib + map_x[ox]]
    return out.reshape(N, C, OH, OW)


def op_softmax(x, axis):
    n = x.ndim
    if axis < 0:
        axis += n
    ax = x.shape[axis]
    inner = int(np.prod(x.shape[axis + 1:], initial=1))
    outer = int(np.prod(x.shape[:axis], initial=1))
    out = np.empty(x.size, np.float32)
    xd = x.ravel()
    for o in range(outer):
        for i in range(inner):
            base = o * ax * inner + i
            m = -np.inf
            for k in range(ax):
                m = max(m, xd[base + k * inner])
            sm = 0.0
            for k in range(ax):
                e = math.exp(xd[base + k * inner] - m)
                out[base + k * inner] = e
                sm += e
            for k in range(ax):
                out[base + k * inner] /= sm
    return out.reshape(x.shape)


# ------------------------------------------------------------------ oracles

def _torch_conv(x, w, b, group, strides, dilations, pads):
    import torch
    import torch.nn.functional as F
    pt, pl, pb, pr = pads
    xt = F.pad(torch.from_numpy(x), (pl, pr, pt, pb))
    return F.conv2d(xt, torch.from_numpy(w),
                    torch.from_numpy(b) if b is not None else None,
                    stride=strides, dilation=dilations, groups=group).numpy()


@pytest.mark.parametrize("shape,wshape,group,strides,dilations,pads", [
    ((1, 3, 8, 9), (4, 3, 3, 3), 1, (1, 1), (1, 1), (1, 1, 1, 1)),
    ((2, 4, 7, 7), (6, 2, 3, 3), 2, (2, 2), (1, 1), (1, 1, 1, 1)),   # grouped, strided
    ((1, 2, 6, 6), (3, 2, 1, 1), 1, (1, 1), (1, 1), (0, 0, 0, 0)),   # 1x1
    ((1, 2, 9, 9), (2, 2, 3, 3), 1, (1, 1), (2, 2), (2, 2, 2, 2)),   # dilated
    ((1, 3, 10, 10), (4, 3, 3, 3), 1, (2, 2), (1, 1), (1, 0, 0, 1)), # asym pads
    ((1, 3, 640 // 64, 640 // 64), (16, 3, 3, 3), 1, (2, 2), (1, 1), (1, 1, 1, 1)),
])
def test_conv_twin(shape, wshape, group, strides, dilations, pads):
    rng = np.random.RandomState(0)
    x = rng.randn(*shape).astype(np.float32)
    w = rng.randn(*wshape).astype(np.float32)
    b = rng.randn(wshape[0]).astype(np.float32)
    got = op_conv(x, w, b, group, strides, dilations, pads)
    want = _torch_conv(x, w, b, group, strides, dilations, pads)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # no-bias path
    np.testing.assert_allclose(
        op_conv(x, w, None, group, strides, dilations, pads),
        _torch_conv(x, w, None, group, strides, dilations, pads),
        rtol=1e-5, atol=1e-5)


def test_maxpool_twin():
    import torch
    import torch.nn.functional as F
    rng = np.random.RandomState(1)
    x = rng.randn(1, 3, 9, 9).astype(np.float32)
    got = op_maxpool(x, (5, 5), (1, 1), (2, 2, 2, 2))
    want = F.max_pool2d(torch.from_numpy(x), 5, stride=1, padding=2).numpy()
    np.testing.assert_array_equal(got, want)
    got2 = op_maxpool(x, (2, 2), (2, 2), (0, 0, 0, 0))
    want2 = F.max_pool2d(torch.from_numpy(x), 2, stride=2).numpy()
    np.testing.assert_array_equal(got2, want2)


@pytest.mark.parametrize("sa,sb", [
    ((1, 2, 8400), (1, 2, 8400)),
    ((1, 2, 8400), (1,)),
    ((3, 1, 5), (1, 4, 5)),
    ((2, 3, 4), (4,)),
    ((5, 1), (1, 7)),
])
def test_binary_broadcast_twin(sa, sb):
    rng = np.random.RandomState(2)
    a = rng.randn(*sa).astype(np.float32)
    b = rng.randn(*sb).astype(np.float32) + 2.0
    for fn, np_fn in [(lambda u, v: u + v, np.add), (lambda u, v: u - v, np.subtract),
                      (lambda u, v: u * v, np.multiply), (lambda u, v: u / v, np.divide)]:
        np.testing.assert_allclose(op_binary_broadcast(a, b, fn), np_fn(a, b),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("shape,perm", [
    ((1, 640, 4, 3), (0, 3, 1, 2)),
    ((1, 144, 84), (0, 2, 1)),
    ((1, 4, 16, 84), (0, 2, 1, 3)),
    ((2, 3, 4), None),
])
def test_transpose_twin(shape, perm):
    rng = np.random.RandomState(3)
    x = rng.randn(*shape).astype(np.float32)
    want = np.transpose(x, perm)
    np.testing.assert_array_equal(op_transpose(x, list(perm) if perm else None), want)


@pytest.mark.parametrize("shape,starts,ends,axes,expect", [
    ((1, 6, 6, 4), [0], [3], [3], np.s_[:, :, :, 0:3]),      # the RGBA pre-op
    ((1, 4, 10), [0], [2], [1], np.s_[:, 0:2, :]),
    ((1, 4, 10), [2], [4], [1], np.s_[:, 2:4, :]),
    ((5, 6), [1, -4], [4, 2 ** 50], [0, 1], np.s_[1:4, 2:]),  # negative + clamp
    ((7,), [2], [5], None, np.s_[2:5]),
])
def test_slice_twin(shape, starts, ends, axes, expect):
    rng = np.random.RandomState(4)
    x = rng.randn(*shape).astype(np.float32)
    np.testing.assert_array_equal(op_slice(x, starts, ends, axes), x[expect])


@pytest.mark.parametrize("shape,starts,ends,axes,steps,expect", [
    ((7,), [-1], [-(2 ** 50)], None, [-1], np.s_[::-1]),     # full reverse
    ((7,), [5], [1], None, [-1], np.s_[5:1:-1]),
    ((2, 8), [0], [8], [1], [2], np.s_[:, 0:8:2]),
    ((2, 8), [7], [-(2 ** 50)], [1], [-2], np.s_[:, 7::-2]),
    ((3, 4), [2, 3], [-(2 ** 50), -(2 ** 50)], [0, 1], [-1, -2],
     np.s_[2::-1, 3::-2]),
])
def test_slice_steps_twin(shape, starts, ends, axes, steps, expect):
    """opSlice steps (input 4): reverse and strided slices — the old JS
    silently computed a step-1 slice (round-5 review find)."""
    rng = np.random.RandomState(4)
    x = rng.randn(*shape).astype(np.float32)
    np.testing.assert_array_equal(op_slice(x, starts, ends, axes, steps), x[expect])


def test_resize_nearest_twin():
    rng = np.random.RandomState(5)
    x = rng.randn(1, 3, 5, 7).astype(np.float32)
    got = op_resize_nearest(x, [1, 1, 2, 2])
    # asymmetric + floor nearest = index repeat
    want = x.repeat(2, axis=2).repeat(2, axis=3)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("shape,axis", [
    ((1, 16, 4, 5), 1),   # the DFL softmax axis
    ((2, 7), -1),
    ((3, 4, 5), 0),
])
def test_softmax_twin(shape, axis):
    rng = np.random.RandomState(6)
    x = (rng.randn(*shape) * 3).astype(np.float32)
    got = op_softmax(x, axis)
    xm = x - x.max(axis=axis, keepdims=True)
    want = np.exp(xm) / np.exp(xm).sum(axis=axis, keepdims=True)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_conv_ox_bounds_exhaustive():
    """The precomputed [lo, hi) output-column range must exactly equal the
    set of ox with in-bounds ix, for every (W, kx, dilation, pad, stride)
    combination in a dense small sweep — this is the JS kernel's one clever
    bit of index math."""
    for W in (1, 2, 3, 5, 8):
        for sw in (1, 2, 3):
            for dw in (1, 2):
                for pl in (0, 1, 2):
                    for kx in (0, 1, 2):
                        OW = (W + 2 * pl - dw * 2 - 1) // sw + 1
                        if OW <= 0:
                            continue
                        xoff = kx * dw - pl
                        lo = max(0, math.ceil(-xoff / sw))
                        hi = min(OW, math.ceil((W - xoff) / sw))
                        valid = [ox for ox in range(OW) if 0 <= ox * sw + xoff < W]
                        assert list(range(lo, hi)) == valid, \
                            (W, sw, dw, pl, kx, lo, hi, valid)


# ----------------------------------------------- whisper-op twins (from JS)

def op_matmul(a, b):
    an, bn = a.ndim, b.ndim
    M, K = a.shape[-2], a.shape[-1]
    Kb, N = b.shape[-2], b.shape[-1]
    assert K == Kb
    batch_shape = list(np.broadcast_shapes(a.shape[:-2], b.shape[:-2]))
    nb = len(batch_shape)
    batch = int(np.prod(batch_shape, initial=1))
    pad = lambda sh: [1] * (nb - len(sh)) + list(sh)
    sa, sb = pad(a.shape[:-2]), pad(b.shape[:-2])
    sta, stb = [0] * nb, [0] * nb
    acc_a, acc_b = M * K, K * N
    for i in range(nb - 1, -1, -1):
        sta[i] = 0 if sa[i] == 1 else acc_a
        stb[i] = 0 if sb[i] == 1 else acc_b
        acc_a *= sa[i]
        acc_b *= sb[i]
    out = np.zeros(batch * M * N, np.float32)
    ad, bd = a.ravel(), b.ravel()
    idx = [0] * nb
    base_a = base_b = 0
    for bi in range(batch):
        o_base = bi * M * N
        for m in range(M):
            a_row, o_row = base_a + m * K, o_base + m * N
            for n2 in range(N):
                acc = 0.0
                for k in range(K):
                    acc += ad[a_row + k] * bd[base_b + k * N + n2]
                out[o_row + n2] = np.float32(acc)
        for d in range(nb - 1, -1, -1):
            idx[d] += 1
            base_a += sta[d]
            base_b += stb[d]
            if idx[d] < batch_shape[d]:
                break
            idx[d] = 0
            base_a -= batch_shape[d] * sta[d]
            base_b -= batch_shape[d] * stb[d]
    return out.reshape(batch_shape + [M, N])


def op_reduce_mean(x, axes, keepdims=True):
    n = x.ndim
    red = {a + n if a < 0 else a for a in axes}
    out_shape_kept = [1 if i in red else d for i, d in enumerate(x.shape)]
    out_st = row_strides(out_shape_kept)
    map_st = [0 if i in red else s for i, s in enumerate(out_st)]
    count = int(np.prod([d for i, d in enumerate(x.shape) if i in red], initial=1))
    out = np.zeros(int(np.prod(out_shape_kept)), np.float32)
    xd = x.ravel()
    idx = [0] * n
    oi = 0
    for i in range(xd.size):
        out[oi] += xd[i]
        for d in range(n - 1, -1, -1):
            idx[d] += 1
            oi += map_st[d]
            if idx[d] < x.shape[d]:
                break
            idx[d] = 0
            oi -= x.shape[d] * map_st[d]
    out /= count
    shape = out_shape_kept if keepdims else \
        [d for i, d in enumerate(x.shape) if i not in red]
    return out.reshape(shape if shape else [1])


def op_gather(data, indices, axis=0):
    n = data.ndim
    if axis < 0:
        axis += n
    outer = int(np.prod(data.shape[:axis], initial=1))
    inner = int(np.prod(data.shape[axis + 1:], initial=1))
    ax = data.shape[axis]
    shape = list(data.shape[:axis]) + list(indices.shape) + list(data.shape[axis + 1:])
    out = np.empty(int(np.prod(shape, initial=1)), data.dtype)
    dd = data.ravel()
    row_in = ax * inner
    flat_idx = indices.ravel()
    n_idx = flat_idx.size
    for o in range(outer):
        for j in range(n_idx):
            k = int(flat_idx[j])
            if k < 0:
                k += ax
            assert 0 <= k < ax
            out[(o * n_idx + j) * inner:(o * n_idx + j + 1) * inner] = \
                dd[o * row_in + k * inner:o * row_in + (k + 1) * inner]
    return out.reshape(shape)


def op_scatter_nd(data, indices, updates):
    K = indices.shape[-1]
    slab = int(np.prod(data.shape[K:], initial=1))
    st = row_strides(list(data.shape))
    out = data.ravel().copy()
    ud = updates.ravel()
    flat = indices.reshape(-1, K)
    for t in range(flat.shape[0]):
        off = 0
        for j in range(K):
            v = int(flat[t, j])
            if v < 0:
                v += data.shape[j]
            off += v * st[j]
        out[off:off + slab] = ud[t * slab:(t + 1) * slab]
    return out.reshape(data.shape)


def op_where(c, x, y):
    shape = list(np.broadcast_shapes(c.shape, x.shape, y.shape))
    n = len(shape)
    total = int(np.prod(shape, initial=1))
    pad = lambda sh: [1] * (n - len(sh)) + list(sh)

    def mk(t):
        s = pad(t.shape)
        st = row_strides(s)
        return [0 if s[i] == 1 else st[i] for i in range(n)]

    stc, stx, sty = mk(c), mk(x), mk(y)
    out = np.empty(total, np.float32)
    cd, xd, yd = c.ravel(), x.ravel(), y.ravel()
    idx = [0] * n
    ic = ix = iy = 0
    for o in range(total):
        out[o] = xd[ix] if cd[ic] else yd[iy]
        for d in range(n - 1, -1, -1):
            idx[d] += 1
            ic += stc[d]
            ix += stx[d]
            iy += sty[d]
            if idx[d] < shape[d]:
                break
            idx[d] = 0
            ic -= shape[d] * stc[d]
            ix -= shape[d] * stx[d]
            iy -= shape[d] * sty[d]
    return out.reshape(shape)


@pytest.mark.parametrize("sa,sb", [
    ((1, 4, 32), (32, 32)),          # weight matmul
    ((1, 2, 4, 8), (1, 2, 8, 16)),   # attention QK
    ((2, 1, 3, 5), (1, 4, 5, 6)),    # broadcast batch dims
    ((3, 4), (4, 5)),                # plain 2-D
    ((1, 2, 8, 16), (16, 4)),        # 4-D x 2-D
])
def test_matmul_twin(sa, sb):
    rng = np.random.RandomState(7)
    a = rng.randn(*sa).astype(np.float32)
    b = rng.randn(*sb).astype(np.float32)
    np.testing.assert_allclose(op_matmul(a, b), a @ b, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape,axes,keepdims", [
    ((1, 4, 32), [-1], True),   # the layernorm mean
    ((2, 3, 4), [0, 2], True),
    ((2, 3, 4), [1], False),
    ((5,), [0], True),
])
def test_reduce_mean_twin(shape, axes, keepdims):
    rng = np.random.RandomState(8)
    x = rng.randn(*shape).astype(np.float32)
    want = np.mean(x, axis=tuple(a if a >= 0 else a + x.ndim for a in axes),
                   keepdims=keepdims, dtype=np.float64).astype(np.float32)
    if not keepdims and want.ndim == 0:
        want = want.reshape(1)
    np.testing.assert_allclose(op_reduce_mean(x, axes, keepdims), want,
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("dshape,ishape,axis", [
    ((64, 32), (1, 4), 0),    # token embedding
    ((16, 32), (4,), 0),      # positional embedding
    ((2, 5, 3), (2, 2), 1),
    ((7,), (3,), 0),
])
def test_gather_twin(dshape, ishape, axis):
    rng = np.random.RandomState(9)
    data = rng.randn(*dshape).astype(np.float32)
    idx = rng.randint(-dshape[axis], dshape[axis], ishape).astype(np.int64)
    np.testing.assert_array_equal(op_gather(data, idx, axis),
                                  np.take(data, idx, axis=axis))


def test_scatter_nd_twin():
    rng = np.random.RandomState(10)
    # the KV-cache write shape: (layers, 1, ctx, d), tuples (L_new, 3)
    data = rng.randn(2, 1, 16, 32).astype(np.float32)
    upd = rng.randn(4, 32).astype(np.float32)
    idx = np.array([[1, 0, 3], [0, 0, 0], [1, 0, 15], [0, 0, 7]], np.int64)
    got = op_scatter_nd(data, idx, upd)
    want = data.copy()
    for t in range(4):
        want[tuple(idx[t])] = upd[t]
    np.testing.assert_array_equal(got, want)
    # full-depth tuples (K == data.ndim, scalar slabs)
    d2 = rng.randn(3, 4).astype(np.float32)
    u2 = np.array([9.0, 8.0], np.float32)
    i2 = np.array([[0, 1], [2, 3]], np.int64)
    got2 = op_scatter_nd(d2, i2, u2)
    want2 = d2.copy()
    want2[0, 1] = 9.0
    want2[2, 3] = 8.0
    np.testing.assert_array_equal(got2, want2)


def test_where_twin():
    rng = np.random.RandomState(11)
    c = (rng.rand(1, 1, 4, 16) > 0.5).astype(np.float32)
    x = np.float32([0.0]).reshape(1)       # scalar branches, like the mask op
    y = np.float32([-1e9]).reshape(1)
    got = op_where(c, x, y)
    want = np.where(c.astype(bool), x, y).astype(np.float32)
    np.testing.assert_array_equal(got, want)
    # dense branches with broadcasting
    x2 = rng.randn(3, 1, 5).astype(np.float32)
    y2 = rng.randn(1, 4, 5).astype(np.float32)
    c2 = (rng.rand(3, 4, 5) > 0.3).astype(np.float32)
    np.testing.assert_array_equal(op_where(c2, x2, y2),
                                  np.where(c2.astype(bool), x2, y2))


# ------------------------------------------------------- JS<->twin lockstep
# Content-hash lock (VERDICT r3 #7): each twinned interp.js kernel's function
# body is hashed here. Editing the JS without re-porting its twin (and
# re-recording the hash) fails this test — the "twins" cannot silently stop
# being twins. Regenerate after a deliberate twin update with:
#   python tests/test_interp_twins.py --hashes

JS_TWIN_HASHES = {
    "opConv": "72e30d22196d4469",
    "opMaxPool": "9f743ac229af717b",
    "opBinary": "5367648306408f2c",
    "opWhere": "8932a0bda4e7ccfd",
    "opMatMul": "0a0cf1c4a8a6a2aa",
    "opReduceMean": "833d8339ffd5c1c8",
    "opGather": "73efaeb6a6012fe6",
    "opScatterND": "f6318fd42c1583ec",
    "opTranspose": "28cc097dfdb8a001",
    "opSlice": "3bfd1703a3d7e4c0",
    "opResizeNearest": "038257ef722f17bf",
    "opSoftmax": "8ab6656429169dc5",
}

_INTERP_JS = __import__("os").path.join(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__)),
    "..", "onnxstream_tpu", "api", "interp.js",
)


def _js_function_hash(src: str, name: str) -> str:
    import hashlib

    i = src.index(f"function {name}(")
    j = src.index("{", i)
    depth = 0
    for k in range(j, len(src)):
        if src[k] == "{":
            depth += 1
        elif src[k] == "}":
            depth -= 1
            if depth == 0:
                body = src[i:k + 1]
                norm = "\n".join(l.rstrip() for l in body.splitlines())
                return hashlib.sha256(norm.encode()).hexdigest()[:16]
    raise ValueError(f"unbalanced braces in {name}")


def test_js_twin_lockstep():
    src = open(_INTERP_JS).read()
    stale = {}
    for name, want in JS_TWIN_HASHES.items():
        got = _js_function_hash(src, name)
        if got != want:
            stale[name] = got
    assert not stale, (
        f"interp.js kernels changed without a twin re-port: {stale}. "
        "Re-port the Python twin(s) above to match the JS, re-run the twin "
        "oracle tests, then update JS_TWIN_HASHES (python "
        "tests/test_interp_twins.py --hashes prints current values)."
    )


if __name__ == "__main__":
    import sys

    if "--hashes" in sys.argv:
        _src = open(_INTERP_JS).read()
        for _n in JS_TWIN_HASHES:
            print(f'    "{_n}": "{_js_function_hash(_src, _n)}",')
