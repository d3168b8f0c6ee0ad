"""Session/planner/executor integration tests, ending in the real YOLOv8n E2E."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from onnxstream_tpu.ir import parse_model_txt
from onnxstream_tpu.runtime.config import SessionConfig
from onnxstream_tpu.runtime.session import Session
from onnxstream_tpu.runtime.weights import DictWeightsProvider

from conftest import YOLO_DIR, has_yolo


def make_session(model_txt, weights, config=None):
    s = Session(config=config or SessionConfig(), weights_provider=DictWeightsProvider(weights))
    s.read_string(model_txt)
    return s


SILU_MODEL = """\
c1:Conv*input:x(1,3,8,8);w.bin(float32:4,3,3,3);b.bin(float32:4)*output:h(1,4,8,8)*dilations:1,1;group:1;kernel_shape:3,3;pads:1,1,1,1;strides:1,1
s1:Sigmoid*input:h(1,4,8,8)*output:hs(1,4,8,8)
m1:Mul*input:h(1,4,8,8);hs(1,4,8,8)*output:y(1,4,8,8)
"""


def silu_weights(seed=0):
    rng = np.random.RandomState(seed)
    return {
        "w.bin": rng.randn(4, 3, 3, 3).astype(np.float32),
        "b.bin": rng.randn(4).astype(np.float32),
    }


def test_silu_graph_matches_torch():
    w = silu_weights()
    s = make_session(SILU_MODEL, w)
    x = np.random.RandomState(1).randn(1, 3, 8, 8).astype(np.float32)
    s.add_tensor("x", x)
    out = s.run()["y"]
    ref = torch.tensor(x)
    ref = F.conv2d(ref, torch.tensor(w["w.bin"]), torch.tensor(w["b.bin"]), padding=1)
    ref = ref * torch.sigmoid(ref)
    np.testing.assert_allclose(out, ref.numpy(), rtol=1e-4, atol=1e-4)


def test_eager_matches_jit():
    w = silu_weights()
    x = np.random.RandomState(1).randn(1, 3, 8, 8).astype(np.float32)
    s1 = make_session(SILU_MODEL, w)
    s1.add_tensor("x", x)
    jit_out = s1.run()["y"]
    s2 = make_session(SILU_MODEL, w)
    s2.add_tensor("x", x)
    eager_out = s2.run(eager=True)["y"]
    np.testing.assert_allclose(jit_out, eager_out, rtol=1e-5, atol=1e-5)


def test_bf16_compute():
    w = silu_weights()
    s = make_session(SILU_MODEL, w, SessionConfig(compute_dtype="bfloat16"))
    x = np.random.RandomState(1).randn(1, 3, 8, 8).astype(np.float32)
    s.add_tensor("x", x)
    out = s.run()["y"]
    assert out.dtype == np.float32  # outputs restored to fp32 (reference parity)
    s32 = make_session(SILU_MODEL, w)
    s32.add_tensor("x", x)
    ref = s32.run()["y"]
    np.testing.assert_allclose(out, ref, rtol=0.1, atol=0.1)


HOST_MATH_MODEL = """\
sh:Shape*input:x(2,3,4)*output:shp(3)
g:Gather*input:shp(3);idx.bin(int64:1)*output:d1(1)*axis:0
c:Concat*input:d1(1);two.bin(int64:1)*output:ns(2)*axis:0
r:Reshape*input:x(2,3,4);ns(2)*output:y(3,8)
"""


def test_host_shape_math_is_folded():
    w = {"idx.bin": np.array([1], np.int64), "two.bin": np.array([8], np.int64)}
    s = make_session(HOST_MATH_MODEL, w)
    x = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    s.add_tensor("x", x)
    out = s.run()["y"]
    np.testing.assert_allclose(out, x.reshape(3, 8))
    ex = s._executor()
    # the Shape/Gather/Concat chain ran on the host; only Reshape is a device op
    assert ex.plan.op_modes == ["host", "host", "host", "device"]
    # int64 weights were pinned host-side, never uploaded
    assert not ex.plan.arg_weights or all(wt.file_dtype.value != "int64" for wt in ex.plan.arg_weights)


def test_static_required_weight_pinned():
    # Resize scales arrive as a float32 weight: the planner must pin it host-side
    model = (
        "r:Resize*input:x(1,2,4,4);;sc.bin(float32:4)*output:y(1,2,8,8)"
        "*coordinate_transformation_mode:asymmetric;mode:nearest;nearest_mode:floor\n"
    )
    w = {"sc.bin": np.array([1, 1, 2, 2], np.float32)}
    s = make_session(model, w)
    x = np.random.RandomState(0).randn(1, 2, 4, 4).astype(np.float32)
    s.add_tensor("x", x)
    out = s.run()["y"]
    assert out.shape == (1, 2, 8, 8)
    ex = s._executor()
    assert "sc.bin" in ex.plan.static_weights


def test_declared_shape_mismatch_raises():
    bad = SILU_MODEL.replace("y(1,4,8,8)", "y(1,4,9,9)")
    s = make_session(bad, silu_weights())
    s.add_tensor("x", np.zeros((1, 3, 8, 8), np.float32))
    from onnxstream_tpu.runtime.planner import PlanError

    with pytest.raises(PlanError, match="check_output_shape"):
        s.run()


def test_segmented_streaming_matches_single_segment():
    # force multiple segments with a tiny HBM budget
    w = silu_weights()
    x = np.random.RandomState(1).randn(1, 3, 8, 8).astype(np.float32)
    model = SILU_MODEL + (
        "c2:Conv*input:y(1,4,8,8);w2.bin(float32:4,4,1,1);b2.bin(float32:4)*output:z(1,4,8,8)"
        "*dilations:1,1;group:1;kernel_shape:1,1;pads:0,0,0,0;strides:1,1\n"
    )
    rng = np.random.RandomState(7)
    w["w2.bin"] = rng.randn(4, 4, 1, 1).astype(np.float32)
    w["b2.bin"] = rng.randn(4).astype(np.float32)

    s_full = make_session(model, dict(w))
    s_full.add_tensor("x", x)
    ref = s_full.run()["z"]

    cfg = SessionConfig(hbm_budget_bytes=460)  # conv1 weights ~448 B, conv2 ~80 B
    s_seg = make_session(model, dict(w), cfg)
    s_seg.add_tensor("x", x)
    out = s_seg.run()["z"]
    ex = s_seg._executor()
    assert len(ex.segments) >= 2
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    # second run must also work (provider restart path)
    out2 = s_seg.run()["z"]
    np.testing.assert_allclose(out2, ref, rtol=1e-5, atol=1e-5)


def test_hbm_stats_xla_accounting_fallback():
    """Where the device exposes no allocator stats (tunneled TPU), hbm_stats
    falls back to XLA buffer-assignment accounting; streamed mode adds the
    next segment's double-buffered weights to the live set."""
    w = silu_weights()
    x = np.random.RandomState(1).randn(1, 3, 8, 8).astype(np.float32)

    s = make_session(SILU_MODEL, dict(w))
    s.add_tensor("x", x)
    s.run()
    ex = s._executor()
    acc = ex.hbm_accounting()
    assert acc is not None and acc["mode"] == "resident"
    # weights are bf16/fp32 on device; peak covers at least the weight bytes
    assert acc["peak_bytes"] >= acc["weight_bytes"] > 0

    cfg = SessionConfig(hbm_budget_bytes=460)
    s2 = make_session(SILU_MODEL, dict(w), cfg)
    s2.add_tensor("x", x)
    s2.run()
    ex2 = s2._executor()
    if len(ex2.segments) >= 2:
        acc2 = ex2.hbm_accounting()
        assert acc2 is not None and acc2["mode"] == "streamed"
        assert acc2["segments"] == len(ex2.segments)
        assert acc2["peak_bytes"] > 0

    # the Session-level wrapper reports a peak either way (allocator stats
    # or the XLA fallback)
    stats = s.hbm_stats()
    assert stats.get("peak_bytes_in_use", 0) > 0

    # derived-aval path: accounting works even when the compiled fn was
    # driven directly (bench bypasses Executor.run, so no recorded avals)
    ex._seg_arg_avals.clear()
    acc3 = ex.hbm_accounting()
    assert acc3 is not None and acc3["peak_bytes"] == acc["peak_bytes"]


def test_weights_manifest():
    s = make_session(SILU_MODEL, silu_weights())
    m = s.get_weights_names()
    assert m == "float32:w.bin|float32:b.bin"


@pytest.mark.skipif(not has_yolo(), reason="reference YOLO model not present")
def test_yolo_e2e():
    """Full real-model E2E: YOLOv8n 640x640, jitted vs eager oracle."""
    cfg = SessionConfig()
    s = Session(config=cfg, weights_provider_name="ram+prefetch")
    s.read_file(YOLO_DIR + "model.txt")
    rng = np.random.RandomState(0)
    x = rng.rand(1, 3, 640, 640).astype(np.float32)
    s.add_tensor("images", x)
    out = s.run()
    (y,) = out.values()
    assert y.shape == (1, 84, 8400)
    # box coords (first 4 rows) finite, class scores (rows 4:) in [0,1] (post-sigmoid)
    assert np.isfinite(y).all()
    assert (y[:, 4:, :] >= 0).all() and (y[:, 4:, :] <= 1).all()

    eager = s.run(eager=True)
    (y2,) = eager.values()
    np.testing.assert_allclose(y, y2, rtol=1e-3, atol=1e-3)


def test_force_uint8_storage_set():
    """Named float weights demoted to uint8 HBM residency (reference
    force_uint8_storage demotion, src/onnxstream.cpp:3764-3808)."""
    import numpy as np

    from onnxstream_tpu.runtime.config import SessionConfig
    from onnxstream_tpu.runtime.session import Session
    from onnxstream_tpu.runtime.weights import DictWeightsProvider

    rng = np.random.RandomState(0)
    w = rng.randn(64, 32).astype(np.float32)
    x = rng.randn(4, 64).astype(np.float32)
    model = "mm:MatMul*input:x(4,64);w.bin(float32:64,32)*output:y(4,32)\n"

    cfg = SessionConfig(force_uint8_storage_set={"w.bin"})
    s = Session(config=cfg, weights_provider=DictWeightsProvider({"w.bin": w}))
    s.read_string(model)
    s.add_tensor("x", x)
    y = np.asarray(s.run()["y"], np.float32)
    ref = x @ w
    # quantized storage: approximate result, uint8 upload dtype
    ex = s._executor()
    warg = next(a for a in ex.plan.arg_weights if a.name == "w.bin")
    assert np.dtype(warg.upload_dtype) == np.uint8
    assert warg.quant is not None and warg.quant[0] > 0
    assert np.abs(y - ref).max() < 2.0
    assert np.abs(y - ref).max() > 0  # it IS quantized


def test_pipeline_parallel_segments_match_single_device():
    """pp_devices: segments pinned to stage devices in contiguous blocks;
    outputs must match the single-device run (8 virtual CPU devices)."""
    import jax
    import numpy as np

    from onnxstream_tpu.models.sd.unet import TINY, build_unet
    from onnxstream_tpu.runtime.config import SessionConfig
    from onnxstream_tpu.runtime.session import Session
    from onnxstream_tpu.runtime.weights import DictWeightsProvider

    g = build_unet(TINY)
    rng = np.random.RandomState(0)
    ins = {
        "sample": rng.rand(1, 4, 16, 16).astype(np.float32),
        "timestep": np.array([500.0], np.float32),
        "encoder_hidden_states": rng.rand(1, 7, 32).astype(np.float32),
    }

    def run(cfg):
        s = Session(config=cfg, weights_provider=DictWeightsProvider(g.weights))
        s.read_string(g.to_text())
        for k, v in ins.items():
            s.add_tensor(k, v)
        out = s.run()
        return np.asarray(out["out_sample"], np.float32), s._executor()

    base, _ = run(SessionConfig())
    devs = jax.devices()[:4]
    cfg = SessionConfig(hbm_budget_bytes=1 << 20, pp_devices=devs)
    pp, ex = run(cfg)
    assert len(ex.segments) > 1, "budget should split the graph into stages"
    # each stage's weights live on its own device
    seen_devices = set()
    for si in range(len(ex.segments)):
        seen_devices.add(ex._seg_device(si))
    assert len(seen_devices) > 1
    np.testing.assert_allclose(pp, base, rtol=2e-4, atol=1e-5)
    # second run reuses resident per-stage weights
    pp2, _ = run(cfg)
    np.testing.assert_allclose(pp2, base, rtol=2e-4, atol=1e-5)


def test_pipeline_parallel_contiguous_placement_minimal_hops():
    """A linear graph's segments map to contiguous stage blocks: the number
    of cross-stage activation hops equals n_stages - 1 (round-robin would
    hop on every boundary)."""
    import jax
    import numpy as np

    from onnxstream_tpu.runtime.config import SessionConfig
    from onnxstream_tpu.runtime.session import Session
    from onnxstream_tpu.runtime.weights import DictWeightsProvider

    # 12-matmul linear chain, one weight each -> 12 segments at a tiny budget
    rng = np.random.RandomState(0)
    K = 64
    lines, weights = [], {}
    for i in range(12):
        src = "x" if i == 0 else f"t{i - 1}"
        lines.append(
            f"mm{i}:MatMul*input:{src}({1},{K});w{i}.bin(float32:{K},{K})*output:t{i}(1,{K})"
        )
        weights[f"w{i}.bin"] = (rng.randn(K, K) / np.sqrt(K)).astype(np.float32)
    devs = jax.devices()[:4]
    cfg = SessionConfig(hbm_budget_bytes=K * K * 4 + 1, pp_devices=devs)
    s = Session(config=cfg, weights_provider=DictWeightsProvider(weights))
    s.read_string("\n".join(lines) + "\n")
    s.add_tensor("x", rng.randn(1, K).astype(np.float32))
    y = np.asarray(s.run()[f"t{11}"], np.float32)
    assert np.isfinite(y).all()
    ex = s._executor()
    n_seg = len(ex.segments)
    assert n_seg >= len(devs), f"expected many segments, got {n_seg}"
    assign = [ex._seg_device(si) for si in range(n_seg)]
    hops = sum(1 for a, b in zip(assign, assign[1:]) if a is not b)
    n_stages = len(set(assign))
    assert n_stages == len(devs)
    assert hops == n_stages - 1, (hops, [str(d) for d in assign])
    # contiguous blocks are balanced within one segment
    from collections import Counter

    counts = Counter(assign).values()
    assert max(counts) - min(counts) <= 1


def test_ram_host_copy_released_after_device_residency():
    """Once weights are HBM-resident, the Ram provider's host copy is freed
    via remove() (reference exclusion set, src/onnxstream.cpp:4561-4567);
    a re-plan re-pulls from the inner provider."""
    import numpy as np

    from onnxstream_tpu.runtime.session import Session
    from onnxstream_tpu.runtime.weights import (
        DiskNoCacheWeightsProvider,
        RamWeightsProvider,
    )

    import tempfile, os

    d = tempfile.mkdtemp()
    w = np.arange(6, dtype=np.float32)
    w.tofile(os.path.join(d, "w.bin"))
    prov = RamWeightsProvider(DiskNoCacheWeightsProvider(d + os.sep))
    s = Session(weights_provider=prov)
    s.read_string("m:Mul*input:x(2,3);w.bin(float32:2,3)*output:y(2,3)\n")
    x = np.ones((2, 3), np.float32)
    s.add_tensor("x", x)
    y1 = np.asarray(s.run()["y"])
    assert "w.bin" not in prov._cache  # host copy released
    # a second run (cached executor + device weights) still works
    s.clear_tensors()
    s.add_tensor("x", x * 2)
    y2 = np.asarray(s.run()["y"])
    np.testing.assert_allclose(y2, 2 * y1)
    # a new shape bucket re-plans and re-pulls from disk
    s.clear_tensors()
    s.add_tensor("x", np.ones((1, 3), np.float32))
    with np.errstate(all="ignore"):
        try:
            s.run()
        except Exception:
            pass  # shape (1,3) may violate declared dims; the pull is the point


def test_shared_device_weight_cache():
    """Shared HBM cache across sessions: identical big weights upload once;
    same-name different-shape constants don't collide (keyed by shape); a
    shared hit carries forced-quant params to the new executor."""
    import numpy as np

    from onnxstream_tpu.runtime.config import SessionConfig
    from onnxstream_tpu.runtime.session import Session
    from onnxstream_tpu.runtime.weights import DictWeightsProvider

    rng = np.random.RandomState(0)
    w = rng.randn(64, 32).astype(np.float32)
    shared: dict = {}

    def mk(model, weights, **cfg_kw):
        s = Session(
            config=SessionConfig(shared_device_weight_cache=shared,
                                 shared_cache_min_bytes=1024, **cfg_kw),
            weights_provider=DictWeightsProvider(weights),
        )
        s.read_string(model)
        return s

    # 1) two sessions (different input shapes) share one upload of w
    m1 = "mm:MatMul*input:x(4,64);w.bin(float32:64,32)*output:y(4,32)\n"
    m2 = "mm:MatMul*input:x(2,64);w.bin(float32:64,32)*output:y(2,32)\n"
    s1, s2 = mk(m1, {"w.bin": w}), mk(m2, {"w.bin": w})
    x4, x2 = rng.randn(4, 64).astype(np.float32), rng.randn(2, 64).astype(np.float32)
    s1.add_tensor("x", x4)
    np.testing.assert_allclose(np.asarray(s1.run()["y"]), x4 @ w, rtol=1e-4, atol=1e-5)
    assert len(shared) == 1
    s2.add_tensor("x", x2)
    np.testing.assert_allclose(np.asarray(s2.run()["y"]), x2 @ w, rtol=1e-4, atol=1e-5)
    assert len(shared) == 1  # hit, not a second entry

    # 2) same NAME, different shape/content (bucketed masks): no collision
    wa = rng.randn(64, 32).astype(np.float32)
    wb = rng.randn(32, 16).astype(np.float32)
    ma = "mm:MatMul*input:x(4,64);m.bin(float32:64,32)*output:y(4,32)\n"
    mb = "mm:MatMul*input:x(4,32);m.bin(float32:32,16)*output:y(4,16)\n"
    sa, sb = mk(ma, {"m.bin": wa}), mk(mb, {"m.bin": wb})
    xa, xb = rng.randn(4, 64).astype(np.float32), rng.randn(4, 32).astype(np.float32)
    sa.add_tensor("x", xa)
    np.testing.assert_allclose(np.asarray(sa.run()["y"]), xa @ wa, rtol=1e-4, atol=1e-5)
    sb.add_tensor("x", xb)
    np.testing.assert_allclose(np.asarray(sb.run()["y"]), xb @ wb, rtol=1e-4, atol=1e-5)

    # 3) forced-quant weight: second session's hit inherits (scale, zp)
    shared_q: dict = {}
    wq = rng.randn(64, 32).astype(np.float32)
    mq = "mm:MatMul*input:x(4,64);q.bin(float32:64,32)*output:y(4,32)\n"
    kw = dict(force_uint8_storage_set={"q.bin"})
    q1 = mk(mq, {"q.bin": wq}, **kw)
    q1.config.shared_device_weight_cache = shared_q
    q1.add_tensor("x", x4)
    y1 = np.asarray(q1.run()["y"])
    mq2 = "mm:MatMul*input:x(2,64);q.bin(float32:64,32)*output:y(2,32)\n"
    q2 = mk(mq2, {"q.bin": wq}, **kw)
    q2.config.shared_device_weight_cache = shared_q
    q2.add_tensor("x", x2)
    y2 = np.asarray(q2.run()["y"])
    assert np.abs(y2).max() > 0, "shared hit lost the quant params (all-zero output)"
    np.testing.assert_allclose(y2, x2 @ wq, atol=2.0)


def test_ram_warm_cache_survives_remove():
    """Warm Ram cache (WASM fill-in-place flow) is the source of truth —
    releasing device-resident weights must not drop it."""
    import numpy as np

    from onnxstream_tpu.dtypes import DType
    from onnxstream_tpu.runtime.weights import DiskNoCacheWeightsProvider, RamWeightsProvider

    p = RamWeightsProvider(DiskNoCacheWeightsProvider("/nonexistent/"))
    buf = p.add_empty_and_return("w.bin", DType.float32, (4,))
    buf[:] = [1, 2, 3, 4]
    p.remove("w.bin")  # no-op while warm
    np.testing.assert_array_equal(p.get("w.bin", DType.float32, (4,)), [1, 2, 3, 4])


def test_pp_donation_does_not_delete_resident_weights():
    """PP mode keeps per-stage resident weights; with hbm_budget_bytes > 0
    the old donation rule still fired for >16 MB segments, so XLA could
    delete a cached buffer on run 1 and run 2 died with "Array has been
    deleted" (round-5 review find). The same guard covers shared-cache hits
    in streamed mode. Two runs of the SAME session must agree."""
    import jax
    import numpy as np

    from onnxstream_tpu.runtime.config import SessionConfig
    from onnxstream_tpu.runtime.session import Session
    from onnxstream_tpu.runtime.weights import DictWeightsProvider

    rng = np.random.RandomState(0)
    K = 2048  # 16.8 MB per weight: over the 1<<24 donation threshold
    lines, weights = [], {}
    for i in range(3):
        src = "x" if i == 0 else f"t{i - 1}"
        lines.append(
            f"mm{i}:MatMul*input:{src}({1},{K});w{i}.bin(float32:{K},{K})*output:t{i}(1,{K})"
        )
        weights[f"w{i}.bin"] = (rng.randn(K, K) / np.sqrt(K)).astype(np.float32)
    cfg = SessionConfig(hbm_budget_bytes=K * K * 4 + 1,
                        pp_devices=jax.devices()[:2], donate_weights=True)
    s = Session(config=cfg, weights_provider=DictWeightsProvider(weights))
    s.read_string("\n".join(lines) + "\n")
    s.add_tensor("x", rng.randn(1, K).astype(np.float32))
    ex = s._executor()
    # the crash itself only reproduces where XLA honors donation (TPU); the
    # policy is asserted directly so the regression is caught on CPU CI too
    for si in range(len(ex.segments)):
        assert ex._donate(si) == (), f"segment {si} would donate cached weights"
    y1 = np.asarray(s.run()["t2"], np.float32)
    y2 = np.asarray(s.run()["t2"], np.float32)  # crashed before the fix (TPU)
    np.testing.assert_array_equal(y1, y2)


def test_pp_weight_shared_across_stages_hops_devices():
    """A weight used by segments on DIFFERENT pp stages (tied weights) was
    served from the first stage's cache without a device hop, handing the
    second stage's jit an input on the wrong device (round-5 review find).
    The hit path must hop device-to-device — the provider may have already
    released the host copy."""
    import jax
    import numpy as np

    from onnxstream_tpu.runtime.config import SessionConfig
    from onnxstream_tpu.runtime.session import Session
    from onnxstream_tpu.runtime.weights import DictWeightsProvider

    rng = np.random.RandomState(0)
    K = 64
    lines, weights = [], {}
    for i in range(4):
        src = "x" if i == 0 else f"t{i - 1}"
        # the LAST matmul reuses w0.bin (tied), all others get their own
        wname = "w0.bin" if i == 3 else f"w{i}.bin"
        lines.append(
            f"mm{i}:MatMul*input:{src}({1},{K});{wname}(float32:{K},{K})*output:t{i}(1,{K})"
        )
        if wname not in weights:
            weights[wname] = (rng.randn(K, K) / np.sqrt(K)).astype(np.float32)
    cfg = SessionConfig(hbm_budget_bytes=K * K * 4 + 1,
                        pp_devices=jax.devices()[:2])
    s = Session(config=cfg, weights_provider=DictWeightsProvider(weights))
    s.read_string("\n".join(lines) + "\n")
    x = rng.randn(1, K).astype(np.float32)
    s.add_tensor("x", x)
    ex = s._executor()
    assert len(ex.segments) == 4
    assert ex._seg_device(0) is not ex._seg_device(3), "w0 must span stages"
    y = np.asarray(s.run()["t3"], np.float32)
    ref = x @ weights["w0.bin"] @ weights["w1.bin"] @ weights["w2.bin"] @ weights["w0.bin"]
    np.testing.assert_allclose(y, ref, rtol=2e-4, atol=2e-4)
