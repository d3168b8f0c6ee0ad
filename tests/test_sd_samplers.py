"""Sampler, scheduler and RNG-parity tests."""

import os
import re
import shutil
import subprocess

import numpy as np
import pytest

from onnxstream_tpu.models.sd.rng import GlibcRand, MT19937, NormalDistributionFloat, randn_4_w_h
from onnxstream_tpu.models.sd.samplers import SAMPLERS, SamplerState, prescale_sample, sampler_step
from onnxstream_tpu.models.sd.scheduler import get_scalings, log_sigmas, sigma_schedule, sigma_to_t

REF = "/root/reference/src/sd.cpp"


# --------------------------------------------------------------------- RNG
@pytest.fixture(scope="module")
def cpp_oracle(tmp_path_factory):
    if shutil.which("g++") is None:
        pytest.skip("g++ not available")
    d = tmp_path_factory.mktemp("rng")
    src = d / "oracle.cpp"
    src.write_text(
        """
#include <random>
#include <cstdio>
#include <cstdlib>
int main(int argc, char** argv) {
    int mode = atoi(argv[1]); int seed = atoi(argv[2]); int n = atoi(argv[3]);
    if (mode == 0) { std::srand(seed); for (int i=0;i<n;i++) printf("%d\\n", rand()); }
    else if (mode == 1) { std::mt19937 g{(unsigned)seed}; for (int i=0;i<n;i++) printf("%u\\n", g()); }
    else { std::mt19937 g{(unsigned)seed}; std::normal_distribution<float> d{0.f,1.f};
           for (int i=0;i<n;i++) printf("%.9g\\n", d(g)); }
    return 0; }
"""
    )
    exe = d / "oracle"
    subprocess.run(["g++", "-O2", "-o", str(exe), str(src)], check=True)

    def run(mode, seed, n):
        out = subprocess.run([str(exe), str(mode), str(seed), str(n)], capture_output=True, text=True)
        return out.stdout.split()

    return run


@pytest.mark.parametrize("seed", [1, 42, 12345])
def test_glibc_rand_exact(cpp_oracle, seed):
    ref = [int(x) for x in cpp_oracle(0, seed, 50)]
    g = GlibcRand(seed)
    assert [g.rand() for _ in range(50)] == ref


@pytest.mark.parametrize("seed", [1, 42, 12345])
def test_mt19937_exact(cpp_oracle, seed):
    ref = [int(x) for x in cpp_oracle(1, seed, 800)]
    assert list(MT19937(seed).next_block(800)) == ref


@pytest.mark.parametrize("seed", [1, 42, 999])
def test_normal_distribution_bit_exact(cpp_oracle, seed):
    ref = np.array([float(x) for x in cpp_oracle(2, seed, 500)], np.float32)
    mine = NormalDistributionFloat(MT19937(seed)).fill(500)
    assert (mine == ref).all()


def test_randn_4_w_h_shape_stats():
    r = randn_4_w_h(123, 16, 12)
    assert r.shape == (4, 12, 16) and r.dtype == np.float32
    assert abs(r.mean()) < 0.1 and abs(r.std() - 1.0) < 0.1


# ---------------------------------------------------------------- scheduler
@pytest.mark.skipif(not os.path.exists(REF), reason="reference not present")
def test_log_sigmas_matches_reference_table():
    src = open(REF).read()
    m = re.search(r"const log_sigmas\[1000\] = \{ ([^}]+)\}", src)
    vals = np.array([float(x.strip().rstrip("f")) for x in m.group(1).split(",")], np.float32)
    ls = log_sigmas()
    # within 1 ulp everywhere (the baked table's log rounding is not reproducible)
    np.testing.assert_allclose(ls, vals, rtol=0, atol=2.5e-7)
    assert (ls == vals).mean() > 0.8


def test_sigma_schedule_shape():
    s = sigma_schedule(10)
    assert len(s) == 11 and s[-1] == 0.0
    assert abs(float(s[0]) - 14.6146) < 1e-3  # SD max sigma
    assert np.all(np.diff(s) < 0)


def test_sigma_to_t_roundtrip():
    s = sigma_schedule(10)
    t = sigma_to_t(float(s[0]))
    assert abs(t - 999.0) < 1e-3
    c_in, c_out = get_scalings(float(s[0]))
    assert abs(c_in - 1.0 / np.sqrt(s[0] ** 2 + 1)) < 1e-7
    assert c_out == -float(s[0])


# ----------------------------------------------------------------- samplers
def _run_sampler(name, steps=10, seed=7, turbo=False, state_dependent=False):
    sigma = sigma_schedule(steps)
    target = np.full((4, 8, 8), 1.5, np.float32)  # denoiser predicts x0 = target

    if state_dependent:
        # a denoiser whose prediction depends on x, so noise/history injected
        # mid-trajectory survives to the output
        def denoise(x, s):
            return 0.5 * x + 0.75

    else:
        def denoise(x, s):
            return target.copy()

    state = SamplerState(name, steps, seed=seed, turbo=turbo)
    x = randn_4_w_h(seed % 1000, 8, 8) * sigma[0]
    for i in range(steps):
        x = prescale_sample(x, name, steps, i, sigma, turbo)
        den = denoise(x, float(sigma[i]))
        x = sampler_step(state, x, den, sigma, i, denoise)
    return x, target


@pytest.mark.parametrize("name", SAMPLERS)
def test_sampler_runs_finite(name):
    x, target = _run_sampler(name)
    assert np.isfinite(x).all(), name


DETERMINISTIC = [
    "euler", "heun", "dpm2", "dpm++2m", "dpm++2mv2", "dpm++2s",
    "ipndm", "ipndm_v", "ipndm_vo", "taylor3", "lms", "ddim", "ddpm", "tcd",
]


@pytest.mark.parametrize("name", DETERMINISTIC)
def test_ode_samplers_converge_to_target(name):
    # with a perfect constant denoiser, the probability-flow ODE solution at
    # sigma=0 is exactly the target
    x, target = _run_sampler(name, steps=10)
    err = float(np.abs(x - target).max())
    assert err < 0.2, (name, err)


@pytest.mark.parametrize("name", SAMPLERS)
def test_sampler_reproducible(name):
    a, _ = _run_sampler(name, seed=11)
    b, _ = _run_sampler(name, seed=11)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("name", ["euler_a", "dpm++2s_a", "ddim_a", "ddpm_a", "tcd_a", "lcm"])
def test_ancestral_seed_changes_output(name):
    a, _ = _run_sampler(name, seed=11, state_dependent=True)
    b, _ = _run_sampler(name, seed=12, state_dependent=True)
    assert np.abs(a - b).max() > 1e-6


def test_multistage_samplers_call_denoiser():
    calls = []
    sigma = sigma_schedule(6)

    def denoise(x, s):
        calls.append(float(s))
        return np.zeros_like(x)

    for name in ("heun", "dpm2", "dpm++2s"):
        calls.clear()
        state = SamplerState(name, 6, seed=3)
        x = randn_4_w_h(1, 8, 8) * sigma[0]
        for i in range(6):
            den = np.zeros_like(x)
            x = sampler_step(state, x, den, sigma, i, denoise)
        assert len(calls) >= 4, name  # second-order stages fired


def test_turbo_reshaper_active():
    a, _ = _run_sampler("euler", steps=5, turbo=False, state_dependent=True)
    b, _ = _run_sampler("euler", steps=5, turbo=True, state_dependent=True)
    assert np.abs(a - b).max() > 1e-5


def test_taylor3_matches_reference_recurrence():
    """Locks taylor3 to the reference's exact update (samplers.h:942-1037,
    ORIGINAL branch): history buffers hold the raw derivatives d_{i-1},
    d_{i-2}; d2 = (d - d_{i-1})/hp and d3 = (d2 - d_{i-2})/hp — note the
    reference deliberately subtracts a FIRST derivative from d2 (adapted
    from mlimgsynth; its alternate branch expands to identical
    coefficients, verified algebraically). A review flagged this as a
    possible unit-mixing bug; it is the spec."""
    import numpy as np

    from onnxstream_tpu.models.sd.samplers import SamplerState, sampler_step
    from onnxstream_tpu.models.sd.scheduler import sigma_schedule

    steps = 5
    sigma = sigma_schedule(steps)
    state = SamplerState("taylor3", steps, seed=0)
    rng = np.random.RandomState(3)
    x = (rng.randn(4, 2, 2) * float(sigma[0])).astype(np.float32)
    dens = [rng.randn(4, 2, 2).astype(np.float32) for _ in range(steps)]

    # independent float64 replication of the reference recurrence
    xe = x.astype(np.float64)
    hist = {}
    hp = None
    for i in range(steps):
        dt = float(sigma[i + 1]) - float(sigma[i])
        d = (xe - dens[i]) / float(sigma[i])
        if i == 0:
            xe = xe + dt * d
        elif i == 1:
            d2 = (d - hist[1]) / hp
            xe = xe + dt * d + dt * dt / 2 * d2
        else:
            d2 = (d - hist[1]) / hp
            d3 = (d2 - hist[2]) / hp  # reference subtracts d_{i-2} here
            xe = xe + dt * d + dt * dt / 2 * d2 + dt ** 3 / 6 * d3
        hist[2] = hist.get(1)
        hist[1] = d
        hp = dt

    xa = x.copy()
    for i in range(steps):
        xa = sampler_step(state, xa, dens[i], sigma, i, None)
    np.testing.assert_allclose(xa, xe.astype(np.float32), rtol=2e-4, atol=2e-4)
