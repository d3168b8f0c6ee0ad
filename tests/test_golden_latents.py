"""Golden-latents parity through a REAL converted model.

The reference's cross-machine equivalence check runs the same diffusion on two
implementations and compares latents (reference src/sd.cpp:2325-2328 save,
3212-3261 decode; print_max_dist 860-876). With no model downloads available,
the independent implementation here is torch: an SD-architecture mini UNet
(GroupNorm+SiLU resnets, self+cross attention, sinusoidal time embedding,
down/up sampling) is exported with torch.onnx.export, converted by the
framework's own onnx2txt, executed by the session runtime, and driven through
the euler_a diffusion loop. The final latents must match

  * the torch oracle running the same loop (cross-implementation parity), and
  * a checked-in fixture (tests/data/golden_latents_mini_sd.npy) pinning the
    result across refactors (the reference's cross-machine guarantee).
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn

HERE = os.path.dirname(os.path.abspath(__file__))
FIXTURE = os.path.join(HERE, "data", "golden_latents_mini_sd.npy")

C, CTX_D, LAT = 32, 24, 16
STEPS = 5


class MiniResnet(nn.Module):
    def __init__(self, cin, cout, temb):
        super().__init__()
        self.norm1 = nn.GroupNorm(8, cin)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.time_proj = nn.Linear(temb, cout)
        self.norm2 = nn.GroupNorm(8, cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.skip = nn.Conv2d(cin, cout, 1) if cin != cout else nn.Identity()

    def forward(self, x, temb):
        h = self.conv1(torch.nn.functional.silu(self.norm1(x)))
        h = h + self.time_proj(torch.nn.functional.silu(temb))[:, :, None, None]
        h = self.conv2(torch.nn.functional.silu(self.norm2(h)))
        return h + self.skip(x)


class MiniAttnBlock(nn.Module):
    def __init__(self, c, ctx_d, heads=4):
        super().__init__()
        self.heads = heads
        self.norm = nn.GroupNorm(8, c)
        self.ln1 = nn.LayerNorm(c)
        self.q1 = nn.Linear(c, c, bias=False)
        self.k1 = nn.Linear(c, c, bias=False)
        self.v1 = nn.Linear(c, c, bias=False)
        self.o1 = nn.Linear(c, c)
        self.ln2 = nn.LayerNorm(c)
        self.q2 = nn.Linear(c, c, bias=False)
        self.k2 = nn.Linear(ctx_d, c, bias=False)
        self.v2 = nn.Linear(ctx_d, c, bias=False)
        self.o2 = nn.Linear(c, c)
        self.ln3 = nn.LayerNorm(c)
        self.ff1 = nn.Linear(c, 4 * c)
        self.ff2 = nn.Linear(4 * c, c)

    def _attn(self, q, k, v):
        b, mq, c = q.shape
        h = self.heads
        d = c // h
        q = q.reshape(b, mq, h, d).permute(0, 2, 1, 3)
        k = k.reshape(b, k.shape[1], h, d).permute(0, 2, 1, 3)
        v = v.reshape(b, v.shape[1], h, d).permute(0, 2, 1, 3)
        s = torch.matmul(q, k.transpose(-1, -2)) * (d ** -0.5)
        p = torch.softmax(s, dim=-1)
        o = torch.matmul(p, v)
        return o.permute(0, 2, 1, 3).reshape(b, mq, c)

    def forward(self, x, ctx):
        b, c, hh, ww = x.shape
        h = self.norm(x).reshape(b, c, hh * ww).permute(0, 2, 1)
        t = self.ln1(h)
        h = h + self.o1(self._attn(self.q1(t), self.k1(t), self.v1(t)))
        t = self.ln2(h)
        h = h + self.o2(self._attn(self.q2(t), self.k2(ctx), self.v2(ctx)))
        t = self.ln3(h)
        h = h + self.ff2(torch.nn.functional.gelu(self.ff1(t)))
        return x + h.permute(0, 2, 1).reshape(b, c, hh, ww)


class MiniUNet(nn.Module):
    """SD-shaped: time embedding -> down resnet+attn -> downsample -> mid ->
    upsample+skip concat -> out conv."""

    def __init__(self):
        super().__init__()
        temb = C * 2
        self.time_fc1 = nn.Linear(C, temb)
        self.time_fc2 = nn.Linear(temb, temb)
        self.conv_in = nn.Conv2d(4, C, 3, padding=1)
        self.down_res = MiniResnet(C, C, temb)
        self.down_attn = MiniAttnBlock(C, CTX_D)
        self.downsample = nn.Conv2d(C, C, 3, stride=2, padding=1)
        self.mid_res1 = MiniResnet(C, 2 * C, temb)
        self.mid_attn = MiniAttnBlock(2 * C, CTX_D)
        self.mid_res2 = MiniResnet(2 * C, 2 * C, temb)
        self.up_res = MiniResnet(3 * C, C, temb)
        self.norm_out = nn.GroupNorm(8, C)
        self.conv_out = nn.Conv2d(C, 4, 3, padding=1)

    def time_embedding(self, t):
        half = C // 2
        freqs = torch.exp(
            -np.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
        )
        ang = t[:, None] * freqs[None]
        return torch.cat([torch.cos(ang), torch.sin(ang)], dim=-1)

    def forward(self, sample, timestep, context):
        temb = self.time_fc2(torch.nn.functional.silu(self.time_fc1(self.time_embedding(timestep))))
        h = self.conv_in(sample)
        h = self.down_res(h, temb)
        h = self.down_attn(h, context)
        skip = h
        h = self.downsample(h)
        h = self.mid_res1(h, temb)
        h = self.mid_attn(h, context)
        h = self.mid_res2(h, temb)
        h = torch.nn.functional.interpolate(h, scale_factor=2.0, mode="nearest")
        h = torch.cat([h, skip], dim=1)
        h = self.up_res(h, temb)
        return self.conv_out(torch.nn.functional.silu(self.norm_out(h)))


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    import io

    from onnxstream_tpu.convert.onnx2txt import convert

    # torch.onnx.export imports the `onnx` package (absent here) only to scan
    # for custom onnxscript functions; this model registers none, so the hook
    # is a pure passthrough
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    onnx_proto_utils._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes

    torch.manual_seed(0)
    model = MiniUNet().eval()
    sample = torch.zeros(1, 4, LAT, LAT)
    timestep = torch.zeros(1)
    context = torch.zeros(1, 8, CTX_D)
    buf = io.BytesIO()
    torch.onnx.export(
        model, (sample, timestep, context), buf,
        input_names=["sample", "timestep", "encoder_hidden_states"],
        output_names=["out_sample"], opset_version=14, dynamo=False,
    )
    out_dir = str(tmp_path_factory.mktemp("mini_sd") / "unet_fp32")
    convert(buf.getvalue(), out_dir)
    return model, out_dir


def _session(out_dir):
    from onnxstream_tpu.runtime.session import Session

    s = Session(weights_provider_name="ram+prefetch")
    s.read_file(os.path.join(out_dir, "model.txt"))
    return s


def _mn(name):
    from onnxstream_tpu.convert.onnx2txt import mangle_name

    return mangle_name(name)


def test_converted_forward_matches_torch(converted):
    """One UNet forward: converted model through the runtime vs torch —
    the print_max_dist probe (reference src/sd.cpp:860-876)."""
    model, out_dir = converted
    rng = np.random.RandomState(1)
    sample = rng.randn(1, 4, LAT, LAT).astype(np.float32)
    t = np.array([500.0], np.float32)
    ctx = rng.randn(1, 8, CTX_D).astype(np.float32)

    s = _session(out_dir)
    s.add_tensor(_mn("sample"), sample)
    s.add_tensor(_mn("timestep"), t)
    s.add_tensor(_mn("encoder_hidden_states"), ctx)
    ours = np.asarray(s.run()[_mn("out_sample")], np.float32)

    with torch.no_grad():
        ref = model(torch.tensor(sample), torch.tensor(t), torch.tensor(ctx)).numpy()
    max_dist = np.abs(ours - ref).max()
    assert max_dist < 2e-3 * max(1.0, np.abs(ref).max()), max_dist


def _diffuse(denoise_eps, steps=STEPS, seed=7):
    """euler_a loop using the framework's scheduler/sampler/rng (bit-parity
    host math, models/sd/{scheduler,samplers,rng}.py)."""
    import onnxstream_tpu.models.sd.samplers as S
    import onnxstream_tpu.models.sd.scheduler as sched
    from onnxstream_tpu.models.sd.rng import randn_4_w_h

    sigma = sched.sigma_schedule(steps)
    x = np.asarray(randn_4_w_h(seed, LAT, LAT) * sigma[0], np.float32)
    state = S.SamplerState("euler_a", steps, seed=seed, turbo=False)
    for i in range(steps):
        s_cur = float(sigma[i])
        c_in, c_out = sched.get_scalings(s_cur)
        t = sched.sigma_to_t(s_cur)
        eps = denoise_eps(x * np.float32(c_in), t)
        den = eps * np.float32(c_out) + x
        x = S.sampler_step(state, x, den, sigma, i, lambda xx, ss: den)
    return x


def test_golden_latents_e2e(converted):
    model, out_dir = converted
    rng = np.random.RandomState(2)
    ctx = rng.randn(1, 8, CTX_D).astype(np.float32)

    s = _session(out_dir)

    def ours_eps(x_in, t):
        s.clear_tensors()
        s.add_tensor(_mn("sample"), x_in[None].astype(np.float32))
        s.add_tensor(_mn("timestep"), np.array([t], np.float32))
        s.add_tensor(_mn("encoder_hidden_states"), ctx)
        return np.asarray(s.run()[_mn("out_sample")], np.float32)[0]

    def torch_eps(x_in, t):
        with torch.no_grad():
            return model(
                torch.tensor(x_in[None]), torch.tensor([t]), torch.tensor(ctx)
            ).numpy()[0]

    ours = _diffuse(ours_eps)
    ref = _diffuse(torch_eps)
    scale = np.abs(ref).max()
    assert np.abs(ours - ref).max() < 5e-3 * scale, np.abs(ours - ref).max()

    # cross-machine pin: the checked-in fixture was generated by the torch
    # oracle path; both implementations must keep reproducing it
    if os.path.exists(FIXTURE):
        golden = np.load(FIXTURE)
        assert np.abs(ref - golden).max() < 5e-3 * scale
        assert np.abs(ours - golden).max() < 1e-2 * scale
    else:  # first run: write it (committed to the repo)
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        np.save(FIXTURE, ref)
