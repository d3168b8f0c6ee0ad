"""Model zoo tests: UNet graphs build, run, fuse attention, and shard."""

import numpy as np
import pytest
import jax

from onnxstream_tpu.models.sd.unet import build_unet, TINY, SD15, param_count
from onnxstream_tpu.runtime.config import SessionConfig
from onnxstream_tpu.runtime.session import Session
from onnxstream_tpu.runtime.weights import DictWeightsProvider


def tiny_session(config=None, batch=1):
    g = build_unet(TINY, batch=batch)
    s = Session(config=config or SessionConfig(), weights_provider=DictWeightsProvider(g.weights))
    s.read_string(g.to_text())
    return s, g


def tiny_inputs(batch=1, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "sample": rng.rand(batch, 4, 16, 16).astype(np.float32),
        "timestep": np.array([500.0], np.float32),
        "encoder_hidden_states": rng.rand(batch, 7, 32).astype(np.float32),
    }


def test_tiny_unet_runs_and_fuses():
    s, g = tiny_session()
    n_sdpa = sum(1 for op in s.graph.ops if op.op_type == "ostpu.sdpa")
    assert n_sdpa == 14  # 7 transformer sites x (self + cross)
    for k, v in tiny_inputs().items():
        s.add_tensor(k, v)
    out = s.run()["out_sample"]
    assert out.shape == (1, 4, 16, 16)
    assert np.isfinite(out).all()


def test_tiny_unet_fused_matches_unfused():
    x = tiny_inputs()
    s1, _ = tiny_session(SessionConfig(fuse_ops_in_attention=True))
    for k, v in x.items():
        s1.add_tensor(k, v)
    fused = s1.run()["out_sample"]
    s2, _ = tiny_session(SessionConfig(fuse_ops_in_attention=False))
    assert not any(op.op_type == "ostpu.sdpa" for op in s2.graph.ops)
    for k, v in x.items():
        s2.add_tensor(k, v)
    plain = s2.run()["out_sample"]
    np.testing.assert_allclose(fused, plain, rtol=2e-4, atol=2e-4)


def test_packed_heads_fusion_matches_unpacked():
    """fuse_attention_heads absorbs the head split/merge (Reshape+Transpose)
    into ostpu.sdpa so the projection dots stay plain dots in XLA (otherwise
    they lower as 8x-FLOP head-axis convolutions, docs/tpu_notes.md)."""
    x = tiny_inputs()
    s1, _ = tiny_session(SessionConfig(fuse_attention_heads=True))
    sdpa1 = [op for op in s1.graph.ops if op.op_type == "ostpu.sdpa"]
    assert sdpa1 and all(op.attr_int("heads", 0) > 0 for op in sdpa1)
    # the head-split Reshape/Transpose ops are gone from the graph
    assert sum(1 for op in s1.graph.ops if op.op_type == "Transpose") < 20
    for k, v in x.items():
        s1.add_tensor(k, v)
    packed = s1.run()["out_sample"]

    s2, _ = tiny_session(SessionConfig(fuse_attention_heads=False))
    sdpa2 = [op for op in s2.graph.ops if op.op_type == "ostpu.sdpa"]
    assert sdpa2 and all(op.attr_int("heads", 0) == 0 for op in sdpa2)
    for k, v in x.items():
        s2.add_tensor(k, v)
    unpacked = s2.run()["out_sample"]
    np.testing.assert_allclose(packed, unpacked, rtol=2e-4, atol=2e-4)


def test_sd15_graph_shape():
    # build only (no weights realization beyond numpy) — structure parity with
    # the reference's documented SD1.5 UNet: ~2050 ops / 854M params
    g = build_unet(SD15)
    assert 1800 <= len(g.ops) <= 2300
    assert abs(param_count(g) / 1e6 - 854) < 30


def test_weights_shardable_over_mesh():
    from onnxstream_tpu.parallel.sharding import make_mesh, shard_weights

    g = build_unet(TINY)
    mesh = make_mesh(8)
    shapes = [a.shape for a in g.weights.values()]
    shardings = shard_weights(mesh, shapes)
    n_sharded = sum(1 for s in shardings if s.spec != jax.sharding.PartitionSpec())
    assert n_sharded > 10  # the big matmul/conv weights shard over tp


def test_sharded_forward_matches_single_device():
    from onnxstream_tpu.parallel.sharding import make_mesh, shard_weights, activation_sharding

    batch = 2
    s, g = tiny_session(batch=batch)
    x = tiny_inputs(batch=batch)
    for k, v in x.items():
        s.add_tensor(k, v)
    ref = s.run()["out_sample"]

    ex = s._executor()
    fn = ex._segment_fn(0)
    mesh = make_mesh(8, dp=2)
    w_shardings = shard_weights(mesh, [w.shape for w in ex.plan.arg_weights])
    weights = [
        jax.device_put(np.asarray(ex.provider.get(w.name, w.file_dtype, w.shape)).astype(w.upload_dtype), sh)
        for w, sh in zip(ex.plan.arg_weights, w_shardings)
    ]
    acts = {k: jax.device_put(v, activation_sharding(mesh, v.shape)) for k, v in x.items()}
    with mesh:
        out = np.asarray(jax.jit(fn)(weights, acts)["out_sample"], dtype=np.float32)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_session_mesh_sharded_inference_matches_single():
    """config.mesh: TP-sharded weights + DP-sharded batch through the normal
    Session.run path; outputs must match the unsharded run."""
    import jax
    import numpy as np

    from onnxstream_tpu.models.sd.unet import TINY, build_unet
    from onnxstream_tpu.parallel.sharding import make_mesh
    from onnxstream_tpu.runtime.config import SessionConfig
    from onnxstream_tpu.runtime.session import Session
    from onnxstream_tpu.runtime.weights import DictWeightsProvider

    g = build_unet(TINY, batch=2)
    rng = np.random.RandomState(0)
    ins = {
        "sample": rng.rand(2, 4, 16, 16).astype(np.float32),
        "timestep": np.array([500.0], np.float32),
        "encoder_hidden_states": rng.rand(2, 7, 32).astype(np.float32),
    }

    def run(mesh):
        s = Session(config=SessionConfig(mesh=mesh),
                    weights_provider=DictWeightsProvider(g.weights))
        s.read_string(g.to_text())
        for k, v in ins.items():
            s.add_tensor(k, v)
        return np.asarray(s.run()["out_sample"], np.float32)

    base = run(None)
    sharded = run(make_mesh(8, dp=2, tp=4))
    np.testing.assert_allclose(sharded, base, rtol=2e-4, atol=1e-5)


def test_sequence_parallel_mesh():
    import numpy as np

    from onnxstream_tpu.parallel.sharding import activation_sharding, make_mesh

    mesh = make_mesh(8, dp=2, tp=2, sp=2)
    assert dict(mesh.shape) == {"dp": 2, "tp": 2, "sp": 2}
    from jax.sharding import PartitionSpec as P

    s = activation_sharding(mesh, (2, 64, 32))
    assert tuple(s.spec)[:2] == ("dp", "sp")
    # weights replicate over sp
    from onnxstream_tpu.parallel.sharding import shard_weight_spec

    assert "sp" not in tuple(shard_weight_spec((64, 32), mesh.shape["tp"]))


def test_make_mesh_error_paths():
    import pytest

    from onnxstream_tpu.parallel.sharding import make_mesh

    # too many devices: clear, actionable message (not a reshape traceback)
    with pytest.raises(ValueError, match="requested 16 devices.*exposes only 8"):
        make_mesh(16)
    with pytest.raises(ValueError, match="xla_force_host_platform_device_count"):
        make_mesh(16, dp=4)
    # non-divisible factorizations
    with pytest.raises(ValueError, match="dp=3 does not divide"):
        make_mesh(8, dp=3)
    with pytest.raises(ValueError, match="tp=3 does not divide"):
        make_mesh(8, tp=3)
    with pytest.raises(ValueError, match="sp=3 does not divide"):
        make_mesh(8, sp=3)
    with pytest.raises(ValueError, match="does not divide"):
        make_mesh(8, dp=4, sp=4)
    with pytest.raises(ValueError, match="!= n_devices"):
        make_mesh(8, dp=2, tp=2, sp=1)


def test_extra_output_survives_attention_fusion():
    """A demanded interior tensor (config.extra_outputs) inside a fusable
    attention chain must disable THAT site's fusion — not be silently fused
    away and KeyError at fetch (round-5 review find; mirrors the keep-set
    handling fuse_groupnorm/fuse_gn_conv already had)."""
    s, _ = tiny_session(SessionConfig(fuse_ops_in_attention=True))
    raw_softmax = [op for op in s._raw_graph.ops if op.op_type == "Softmax"]
    assert raw_softmax
    target = raw_softmax[0].outputs[0].name
    s.add_extra_output(target)
    kept = [op for op in s.graph.ops
            if op.op_type == "Softmax" and op.outputs[0].name == target]
    assert kept, "demanded softmax output was fused away"
    # the OTHER attention sites still fuse
    assert any(op.op_type == "ostpu.sdpa" for op in s.graph.ops)

    for k, v in tiny_inputs().items():
        s.add_tensor(k, v)
    out = s.run()["out_sample"]
    probs = np.asarray(s.get_tensor(target), np.float32)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-3, atol=1e-3)

    # numerics match the fully-fused session
    s2, _ = tiny_session(SessionConfig(fuse_ops_in_attention=True))
    for k, v in tiny_inputs().items():
        s2.add_tensor(k, v)
    ref = s2.run()["out_sample"]
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_mesh_synthetic_weights_are_sharded():
    """synthetic_device_weights + config.mesh: device-generated weights must
    land with the SAME TP shardings the real-fetch path would use — not
    committed to the default device (round-5 review find; the LLM bench
    path's mesh variant)."""
    import jax

    from onnxstream_tpu.models.sd.unet import TINY, build_unet
    from onnxstream_tpu.parallel.sharding import make_mesh, shard_weights
    from onnxstream_tpu.runtime.config import SessionConfig
    from onnxstream_tpu.runtime.session import Session
    from onnxstream_tpu.runtime.weights import DictWeightsProvider

    mesh = make_mesh(8, dp=1, tp=8)
    g = build_unet(TINY, batch=1)
    s = Session(config=SessionConfig(mesh=mesh, synthetic_device_weights=True,
                                     synthetic_min_elements=1 << 8),
                weights_provider=DictWeightsProvider(g.weights))
    s.read_string(g.to_text())
    for k, v in tiny_inputs().items():
        s.add_tensor(k, v)
    ex = s._executor()
    seg = ex.segments[0]
    devs = ex._fetch_segment_weights(seg)
    want = {w.name: sh for w, sh in zip(
        ex.plan.arg_weights,
        shard_weights(mesh, [w.shape for w in ex.plan.arg_weights]))}
    n_sharded = 0
    for w, dev in zip(seg.weight_args, devs):
        assert dev.sharding.is_equivalent_to(want[w.name], len(w.shape)), (
            w.name, dev.sharding, want[w.name])
        if any(p is not None for p in dev.sharding.spec):
            n_sharded += 1
    assert n_sharded > 0, "no weight ended up TP-sharded"
    # (numeric parity of the mesh path is covered by
    # test_session_mesh_sharded_inference_matches_single; running the full
    # 8-device compile here too would push this into the slow tier)
