"""AUTO weight-layout flow (executor._weight_formats): discovery compile,
layout-keyed shared cache, and end-to-end parity. CPU layouts are trivial
(the formats come back default-layout) but the whole code path — AOT AUTO
compile, Format-destination device_put, plain-jit call over committed
arrays — is exercised."""

import os

import numpy as np
import pytest

from onnxstream_tpu.models.sd.unet import build_unet, TINY
from onnxstream_tpu.runtime.config import SessionConfig
from onnxstream_tpu.runtime.session import Session
from onnxstream_tpu.runtime.weights import DictWeightsProvider


@pytest.fixture
def force_auto(monkeypatch):
    monkeypatch.setenv("OSTPU_FORCE_AUTO_LAYOUTS", "1")


def _unet_session(**cfg):
    g = build_unet(TINY)
    s = Session(config=SessionConfig(**cfg), weights_provider=DictWeightsProvider(g.weights))
    s.read_string(g.to_text())
    rng = np.random.RandomState(0)
    for k, v in {
        "sample": rng.rand(1, 4, 16, 16).astype(np.float32),
        "timestep": np.array([500.0], np.float32),
        "encoder_hidden_states": rng.rand(1, 7, 32).astype(np.float32),
    }.items():
        s.add_tensor(k, v)
    return s


def test_auto_layout_parity(force_auto):
    s = _unet_session(auto_weight_layouts=True)
    out = s.run()["out_sample"]
    s2 = _unet_session(auto_weight_layouts=False)
    base = s2.run()["out_sample"]
    np.testing.assert_allclose(out, base, atol=1e-5)
    ex = s._executor()
    fmts = ex._weight_formats(0)
    assert fmts is not None and len(fmts) == len(ex.segments[0].weight_args)


def test_auto_layout_disabled_paths(force_auto):
    import jax

    # mesh / pp_devices opt out of AUTO layouts
    s = _unet_session(auto_weight_layouts=True, pp_devices=[jax.devices()[0]],
                      hbm_budget_bytes=1 << 20)
    ex = s._executor()
    assert ex._weight_formats(0) is None
    out = s.run()["out_sample"]
    assert np.isfinite(out).all()


def test_shared_cache_keys_include_layout(force_auto):
    shared = {}
    s = _unet_session(auto_weight_layouts=True, shared_device_weight_cache=shared,
                      shared_cache_min_bytes=1)
    s.run()
    assert shared, "big weights must land in the shared cache"
    # every key carries a layout component (possibly empty only when formats
    # were unavailable)
    assert all(len(k) == 4 for k in shared)
