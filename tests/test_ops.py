"""Per-op semantics tests against a torch (CPU) oracle.

The reference has no unit tests (SURVEY.md section 4); this is the per-op
golden layer the rebuild adds. Each case exercises the registry impl directly
with device (jnp) inputs.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from onnxstream_tpu.ir import OpNode, TensorSpec
from onnxstream_tpu.ops import Ctx, get_impl


def run_op(op_type, ins, attrs=None, n_out=1, names=None):
    op = OpNode(
        name=f"t/{op_type}",
        op_type=op_type,
        inputs=[TensorSpec(name=f"i{k}") for k in range(len(ins))],
        outputs=[TensorSpec(name=f"o{k}") for k in range(n_out)],
        attrs={k: str(v) for k, v in (attrs or {}).items()},
    )
    dev_ins = [None if x is None else (x if isinstance(x, np.ndarray) else jnp.asarray(x)) for x in ins]
    ctx = Ctx(jnp, "device", None, op.name)
    outs = get_impl(op_type).fn(ctx, op, dev_ins)
    return [np.asarray(o) for o in outs]


def rand(*shape, dtype=np.float32, seed=0):
    rng = np.random.RandomState(seed + len(shape))
    return rng.randn(*shape).astype(dtype)


def assert_close(a, b, tol=1e-5):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=tol, atol=tol)


# --------------------------------------------------------------------- conv
@pytest.mark.parametrize(
    "cin,cout,k,stride,pad,group",
    [(3, 8, 3, 1, 1, 1), (4, 8, 3, 2, 1, 1), (8, 8, 1, 1, 0, 1), (8, 8, 3, 1, 1, 8), (6, 12, 5, 2, 2, 3)],
)
def test_conv2d(cin, cout, k, stride, pad, group):
    x = rand(2, cin, 16, 16)
    w = rand(cout, cin // group, k, k, seed=1)
    b = rand(cout, seed=2)
    (y,) = run_op(
        "Conv",
        [jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)],
        {"dilations": "1,1", "group": group, "kernel_shape": f"{k},{k}", "pads": f"{pad},{pad},{pad},{pad}", "strides": f"{stride},{stride}"},
    )
    ref = F.conv2d(torch.tensor(x), torch.tensor(w), torch.tensor(b), stride=stride, padding=pad, groups=group)
    assert_close(y, ref.numpy(), 1e-4)


def test_conv1d_promoted():
    # the converter promotes Conv1D weights to (O,I,k,1); input stays 3D
    x = rand(1, 4, 20)
    w3 = rand(8, 4, 3, seed=1)
    b = rand(8, seed=2)
    (y,) = run_op(
        "Conv",
        [jnp.asarray(x), jnp.asarray(w3[..., None]), jnp.asarray(b)],
        {"dilations": "1", "group": 1, "kernel_shape": "3", "pads": "1,1", "strides": "1"},
    )
    ref = F.conv1d(torch.tensor(x), torch.tensor(w3), torch.tensor(b), stride=1, padding=1)
    assert_close(y, ref.numpy(), 1e-4)


@pytest.mark.parametrize("ceil_mode", [0, 1])
def test_maxpool(ceil_mode):
    x = rand(1, 3, 15, 15)
    (y,) = run_op(
        "MaxPool",
        [jnp.asarray(x)],
        {"kernel_shape": "3,3", "strides": "2,2", "pads": "1,1,1,1", "ceil_mode": ceil_mode},
    )
    ref = F.max_pool2d(torch.tensor(x), 3, stride=2, padding=1, ceil_mode=bool(ceil_mode))
    assert_close(y, ref.numpy())


def test_avgpool():
    x = rand(1, 3, 16, 16)
    (y,) = run_op("AveragePool", [jnp.asarray(x)], {"kernel_shape": "2,2", "strides": "2,2"})
    ref = F.avg_pool2d(torch.tensor(x), 2, 2)
    assert_close(y, ref.numpy())


# ------------------------------------------------------------------- resize
def test_resize_nearest_asymmetric_floor():
    x = rand(1, 3, 5, 7)
    scales = np.array([1, 1, 2, 2], dtype=np.float32)
    (y,) = run_op(
        "Resize",
        [jnp.asarray(x), None, scales],
        {"coordinate_transformation_mode": "asymmetric", "mode": "nearest", "nearest_mode": "floor"},
    )
    ref = F.interpolate(torch.tensor(x), scale_factor=2, mode="nearest")
    assert_close(y, ref.numpy())


def test_resize_linear_half_pixel():
    x = rand(1, 2, 6, 6)
    scales = np.array([1, 1, 2, 2], dtype=np.float32)
    (y,) = run_op(
        "Resize",
        [jnp.asarray(x), None, scales],
        {"coordinate_transformation_mode": "half_pixel", "mode": "linear"},
    )
    ref = F.interpolate(torch.tensor(x), scale_factor=2, mode="bilinear", align_corners=False)
    assert_close(y, ref.numpy(), 1e-4)


def test_resize_linear_align_corners_sizes():
    x = rand(1, 2, 5, 5)
    sizes = np.array([1, 2, 9, 9], dtype=np.int64)
    (y,) = run_op(
        "Resize",
        [jnp.asarray(x), None, None, sizes],
        {"coordinate_transformation_mode": "align_corners", "mode": "linear"},
    )
    ref = F.interpolate(torch.tensor(x), size=(9, 9), mode="bilinear", align_corners=True)
    assert_close(y, ref.numpy(), 1e-4)


# ------------------------------------------------------------- normalization
def test_instance_norm():
    x = rand(2, 4, 8, 8)
    s = rand(4, seed=1)
    b = rand(4, seed=2)
    (y,) = run_op("InstanceNormalization", [jnp.asarray(x), jnp.asarray(s), jnp.asarray(b)], {"epsilon": 1e-5})
    ref = F.instance_norm(torch.tensor(x), weight=torch.tensor(s), bias=torch.tensor(b), eps=1e-5)
    assert_close(y, ref.numpy(), 1e-4)


def test_layer_norm():
    x = rand(2, 5, 16)
    s = rand(16, seed=1)
    b = rand(16, seed=2)
    (y,) = run_op("LayerNormalization", [jnp.asarray(x), jnp.asarray(s), jnp.asarray(b)], {"axis": -1, "epsilon": 1e-5})
    ref = F.layer_norm(torch.tensor(x), (16,), torch.tensor(s), torch.tensor(b), 1e-5)
    assert_close(y, ref.numpy(), 1e-4)


def test_softmax_axis():
    x = rand(2, 3, 5)
    for axis in (-1, 1, 2):
        (y,) = run_op("Softmax", [jnp.asarray(x)], {"axis": axis})
        assert_close(y, torch.softmax(torch.tensor(x), dim=axis).numpy(), 1e-5)


# ------------------------------------------------------------------- matmul
def test_matmul_batched():
    a, b = rand(2, 4, 8, 16), rand(2, 4, 16, 12, seed=1)
    (y,) = run_op("MatMul", [jnp.asarray(a), jnp.asarray(b)])
    assert_close(y, (torch.tensor(a) @ torch.tensor(b)).numpy(), 1e-4)


def test_matmul_broadcast():
    a, b = rand(3, 8, 16), rand(16, 12, seed=1)
    (y,) = run_op("MatMul", [jnp.asarray(a), jnp.asarray(b)])
    assert_close(y, (torch.tensor(a) @ torch.tensor(b)).numpy(), 1e-4)


@pytest.mark.parametrize("transA,transB", [(0, 0), (0, 1), (1, 0), (1, 1)])
def test_gemm(transA, transB):
    a = rand(8, 16) if not transA else rand(16, 8)
    b = rand(16, 12, seed=1) if not transB else rand(12, 16, seed=1)
    c = rand(12, seed=2)
    (y,) = run_op("Gemm", [jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)], {"alpha": 1.0, "beta": 1.0, "transA": transA, "transB": transB})
    ta = torch.tensor(a).T if transA else torch.tensor(a)
    tb = torch.tensor(b).T if transB else torch.tensor(b)
    assert_close(y, (ta @ tb + torch.tensor(c)).numpy(), 1e-4)


# ----------------------------------------------------------- shape/indexing
def test_reshape_zero_and_minus_one():
    x = rand(2, 3, 4)
    (y,) = run_op("Reshape", [jnp.asarray(x), np.array([0, -1], dtype=np.int64)])
    assert y.shape == (2, 12)


def test_slice_steps():
    x = rand(4, 10)
    (y,) = run_op(
        "Slice",
        [jnp.asarray(x), np.array([8], np.int64), np.array([0], np.int64), np.array([1], np.int64), np.array([-2], np.int64)],
    )
    assert_close(y, x[:, 8:0:-2])


def test_slice_clamp():
    x = rand(4, 10)
    (y,) = run_op("Slice", [jnp.asarray(x), np.array([2], np.int64), np.array([999999], np.int64), np.array([1], np.int64)])
    assert_close(y, x[:, 2:])


def test_gather_negative_indices():
    x = rand(5, 4)
    idx = np.array([[0, -1], [2, -5]], dtype=np.int64)
    (y,) = run_op("Gather", [jnp.asarray(x), jnp.asarray(idx)], {"axis": 0})
    ref = np.take(x, np.where(idx < 0, idx + 5, idx), axis=0)
    assert_close(y, ref)


def test_split_sizes():
    x = rand(2, 7, 3)
    outs = run_op("Split", [jnp.asarray(x), np.array([3, 4], np.int64)], {"axis": 1}, n_out=2)
    assert outs[0].shape == (2, 3, 3) and outs[1].shape == (2, 4, 3)
    assert_close(np.concatenate(outs, 1), x)


def test_concat_transpose_unsqueeze_squeeze_flatten():
    x = rand(2, 3, 4)
    (c,) = run_op("Concat", [jnp.asarray(x), jnp.asarray(x)], {"axis": -1})
    assert c.shape == (2, 3, 8)
    (t,) = run_op("Transpose", [jnp.asarray(x)], {"perm": "2,0,1"})
    assert t.shape == (4, 2, 3)
    (u,) = run_op("Unsqueeze", [jnp.asarray(x), np.array([0, 3], np.int64)])
    assert u.shape == (1, 2, 3, 1, 4)
    (s,) = run_op("Squeeze", [jnp.asarray(u), np.array([0], np.int64)])
    assert s.shape == (2, 3, 1, 4)
    (f,) = run_op("Flatten", [jnp.asarray(x)], {"axis": 2})
    assert f.shape == (6, 4)


def test_expand_bidirectional():
    x = rand(3, 1)
    (y,) = run_op("Expand", [jnp.asarray(x), np.array([2, 1, 4], np.int64)])
    assert y.shape == (2, 3, 4)


def test_where_and_compare():
    a = rand(3, 4)
    b = rand(3, 4, seed=1)
    (lt,) = run_op("Less", [jnp.asarray(a), jnp.asarray(b)])
    (y,) = run_op("Where", [jnp.asarray(lt), jnp.asarray(a), jnp.asarray(b)])
    assert_close(y, np.minimum(a, b))


def test_argmax_select_last():
    x = np.array([[1.0, 3.0, 3.0, 2.0]], dtype=np.float32)
    (y0,) = run_op("ArgMax", [jnp.asarray(x)], {"axis": 1, "keepdims": 0})
    (y1,) = run_op("ArgMax", [jnp.asarray(x)], {"axis": 1, "keepdims": 0, "select_last_index": 1})
    assert y0[0] == 1 and y1[0] == 2


def test_trilu():
    x = rand(4, 4)
    (u,) = run_op("Trilu", [jnp.asarray(x)], {"upper": 1})
    (l,) = run_op("Trilu", [jnp.asarray(x), np.array([-1], np.int64)], {"upper": 0})
    assert_close(u, np.triu(x))
    assert_close(l, np.tril(x, -1))


def test_scatternd():
    data = np.zeros((4, 3), np.float32)
    idx = np.array([[0], [2]], np.int64)
    upd = rand(2, 3)
    (y,) = run_op("ScatterND", [jnp.asarray(data), jnp.asarray(idx), jnp.asarray(upd)])
    ref = data.copy()
    ref[0], ref[2] = upd[0], upd[1]
    assert_close(y, ref)


def test_constant_of_shape_and_range():
    (y,) = run_op("ConstantOfShape", [np.array([2, 3], np.int64)], {"value": "5.5"})
    assert y.dtype == np.float32 and (y == 5.5).all()
    (r,) = run_op("Range", [np.int64(2), np.int64(11), np.int64(3)])
    assert_close(r, np.arange(2, 11, 3))


def test_cast():
    x = np.array([1.7, -2.3, 0.0], np.float32)
    (i,) = run_op("Cast", [jnp.asarray(x)], {"to": 7})
    # device-side integers are int32 (wire int64 is restored at fetch)
    assert i.dtype in (np.int32, np.int64) and list(i) == [1, -2, 0]
    (b,) = run_op("Cast", [jnp.asarray(x)], {"to": 9})
    assert b.dtype == np.bool_ and list(b) == [True, True, False]


def test_int_div_truncates_toward_zero():
    a = np.array([-7, 7, -7, 7], np.int64)
    b = np.array([2, 2, -2, -2], np.int64)
    (y,) = run_op("Div", [jnp.asarray(a), jnp.asarray(b)])
    assert list(y) == [-3, 3, 3, -3]


def test_reduce_mean():
    x = rand(2, 3, 4)
    (y,) = run_op("ReduceMean", [jnp.asarray(x)], {"axes": "1", "keepdims": 1})
    assert_close(y, x.mean(1, keepdims=True), 1e-5)
    (y2,) = run_op("ReduceMean", [jnp.asarray(x), np.array([-1], np.int64)], {"keepdims": 0})
    assert_close(y2, x.mean(-1), 1e-5)


def test_unary_erf_pow():
    x = rand(3, 4)
    (e,) = run_op("Erf", [jnp.asarray(x)])
    assert_close(e, torch.erf(torch.tensor(x)).numpy(), 1e-5)
    (p,) = run_op("Pow", [jnp.asarray(np.abs(x) + 0.5), np.array(2.0, np.float32)])
    assert_close(p, (np.abs(x) + 0.5) ** 2, 1e-4)


def test_shape_op():
    x = rand(2, 3, 4)
    (s,) = run_op("Shape", [jnp.asarray(x)])
    assert s.dtype == np.int64 and list(s) == [2, 3, 4]


def test_conv_im2col_dot_matches_lax():
    """The use_dot_convs path (ops/standard._conv_im2col_dot): im2col + MXU
    dot must match lax.conv_general_dilated across stride/pad/dilation and
    asymmetric kernels (same patch ordering as kernels/qconv.py)."""
    import jax.numpy as jnp
    from jax import lax

    from onnxstream_tpu.ops import Ctx
    from onnxstream_tpu.ops import standard as S
    from onnxstream_tpu.runtime.config import SessionConfig

    rng = np.random.RandomState(0)
    ctx = Ctx(jnp, "device", SessionConfig(), "t")
    cases = [
        (1, 8, 8, 8, 16, 3, 3, 1, 1, 1),
        (1, 4, 16, 16, 8, 3, 3, 1, 1, 1),
        (2, 6, 9, 7, 5, 3, 2, 2, 0, 1),
        (1, 5, 10, 10, 4, 3, 3, 1, 2, 2),
    ]
    for n, c, h, w_, o, kh, kw, stride, pad, dil in cases:
        x = jnp.asarray(rng.randn(n, c, h, w_), jnp.float32)
        wt = jnp.asarray(rng.randn(o, c, kh, kw) * 0.1, jnp.float32)
        b = jnp.asarray(rng.randn(o), jnp.float32)
        got = S._conv_im2col_dot(ctx, x, wt, b, (stride, stride),
                                 [pad, pad, pad, pad], (dil, dil))
        dn = lax.conv_dimension_numbers(x.shape, wt.shape, ("NCHW", "OIHW", "NCHW"))
        ref = lax.conv_general_dilated(
            x, wt, window_strides=(stride, stride), padding=[(pad, pad), (pad, pad)],
            rhs_dilation=(dil, dil), dimension_numbers=dn,
            precision=lax.Precision.HIGHEST,
        ) + b.reshape(1, -1, 1, 1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_conv_rowdot_matches_lax():
    """The use_rowdot_convs path (ops/standard._conv_rowdot): 3x3 stride-1
    same-pad conv as three row-shifted MXU dots over a column-im2col
    (HW, 3C) matrix. Also checks the Conv op dispatches to it only for
    eligible shapes (3x3/s1/p1/d1, C >= 32)."""
    import jax.numpy as jnp
    from jax import lax

    from onnxstream_tpu.ops import Ctx
    from onnxstream_tpu.ops import standard as S
    from onnxstream_tpu.runtime.config import SessionConfig

    rng = np.random.RandomState(1)
    cfg = SessionConfig(use_rowdot_convs=True)
    ctx = Ctx(jnp, "device", cfg, "t")
    for n, c, h, w_, o in [(1, 32, 8, 8, 48), (2, 64, 9, 7, 32), (1, 40, 16, 16, 40)]:
        x = jnp.asarray(rng.randn(n, c, h, w_), jnp.float32)
        wt = jnp.asarray(rng.randn(o, c, 3, 3) * 0.1, jnp.float32)
        b = jnp.asarray(rng.randn(o), jnp.float32)
        got = S._conv_rowdot(ctx, x, wt, b)
        dn = lax.conv_dimension_numbers(x.shape, wt.shape, ("NCHW", "OIHW", "NCHW"))
        ref = lax.conv_general_dilated(
            x, wt, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=dn, precision=lax.Precision.HIGHEST,
        ) + b.reshape(1, -1, 1, 1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)

    # through the op dispatch: a stride-2 conv must NOT take the rowdot path
    # (it falls back to lax.conv) while a 3x3/s1/p1 conv must still be exact
    def conv_op(attrs):
        return OpNode(name="t/Conv", op_type="Conv",
                      inputs=[TensorSpec(name=f"i{k}") for k in range(3)],
                      outputs=[TensorSpec(name="o0")],
                      attrs={k: str(v) for k, v in attrs.items()})

    x = jnp.asarray(rng.randn(1, 32, 8, 8), jnp.float32)
    wt = jnp.asarray(rng.randn(16, 32, 3, 3) * 0.1, jnp.float32)
    (y,) = S._conv(ctx, conv_op({"strides": "1,1", "pads": "1,1,1,1"}), [x, wt, None])
    dn = lax.conv_dimension_numbers(x.shape, wt.shape, ("NCHW", "OIHW", "NCHW"))
    ref = lax.conv_general_dilated(x, wt, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
                                   precision=lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-4, atol=1e-4)
    (y2,) = S._conv(ctx, conv_op({"strides": "2,2", "pads": "1,1,1,1"}), [x, wt, None])
    ref2 = lax.conv_general_dilated(x, wt, (2, 2), [(1, 1), (1, 1)], dimension_numbers=dn,
                                    precision=lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(ref2), rtol=1e-4, atol=1e-4)


# --------------------------------------------- round-5 review op-spec fixes
def test_flatten_negative_axis():
    """ONNX Flatten: axis=-1 means the LAST axis — (2,3,4) -> (6,4); the old
    `% (ndim+1)` wrap sent -1 to ndim and produced (24,1)."""
    x = rand(2, 3, 4)
    (y,) = run_op("Flatten", [jnp.asarray(x)], {"axis": -1})
    assert y.shape == (6, 4)
    assert_close(y, x.reshape(6, 4))
    (y0,) = run_op("Flatten", [jnp.asarray(x)], {"axis": 0})
    assert y0.shape == (1, 24)
    (y2,) = run_op("Flatten", [jnp.asarray(x)], {"axis": -3})
    assert y2.shape == (1, 24)


def test_shape_start_end():
    """opset-15 Shape start/end window (with negative wrapping)."""
    x = rand(2, 3, 4, 5)
    (s,) = run_op("Shape", [jnp.asarray(x)], {"start": 2})
    assert list(s) == [4, 5]
    (s,) = run_op("Shape", [jnp.asarray(x)], {"start": 1, "end": 3})
    assert list(s) == [3, 4]
    (s,) = run_op("Shape", [jnp.asarray(x)], {"start": -1})
    assert list(s) == [5]
    (s,) = run_op("Shape", [jnp.asarray(x)], {"end": -2})
    assert list(s) == [2, 3]
    (s,) = run_op("Shape", [jnp.asarray(x)], {"start": 3, "end": 1})
    assert list(s) == []  # empty window, not negative


def test_avgpool_ceil_mode():
    x = rand(1, 3, 15, 15)
    (y,) = run_op(
        "AveragePool",
        [jnp.asarray(x)],
        {"kernel_shape": "3,3", "strides": "2,2", "ceil_mode": 1},
    )
    ref = F.avg_pool2d(torch.tensor(x), 3, stride=2, ceil_mode=True,
                       count_include_pad=False)
    assert y.shape == tuple(ref.shape)
    assert_close(y, ref.numpy(), 1e-4)


def test_split_uneven_too_many_outputs_rejected():
    """dim 5 into 4 even chunks is impossible (last size would be negative);
    the old code silently emitted clamped/empty outputs."""
    x = rand(5, 2)
    with pytest.raises(ValueError):
        run_op("Split", [jnp.asarray(x)], {"axis": 0}, n_out=4)
    # the legal uneven case still works: ceil chunks with a short tail
    outs = run_op("Split", [jnp.asarray(x)], {"axis": 0}, n_out=3)
    assert [o.shape[0] for o in outs] == [2, 2, 1]
