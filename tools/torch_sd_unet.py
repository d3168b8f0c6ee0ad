"""Real-architecture SD1.5 UNet in plain torch (random weights).

Scale-up of the tests/test_golden_latents.py MiniUNet to the REAL SD1.5
configuration (860M params: channels 320/640/1280/1280, 2 resnets per down
level, depth-1 transformer blocks with 8-head self+cross attention on a
768-d context, GEGLU feed-forward, 1280-d time embedding) so the converter
(convert/onnx2txt.py) is validated at real model scale and op mix — the
reference's converter runs the actual SD1.5 checkpoint
(/root/reference/onnx2txt/onnx2txt.ipynb); with no network access, matching
the architecture exactly (vs HF diffusers UNet2DConditionModel config for
runwayml/stable-diffusion-v1-5) is the strongest available substitute.

Used by tools/fullsize_converter_proof.py and the slow-tier test
tests/test_fullsize_convert.py (on a reduced-width twin).
"""

from __future__ import annotations

import math

import numpy as np
import torch
from torch import nn
import torch.nn.functional as F


class Resnet(nn.Module):
    def __init__(self, cin, cout, temb):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, cin)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb, cout)
        self.norm2 = nn.GroupNorm(32, cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(cin, cout, 1) if cin != cout else nn.Identity()

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        return h + self.conv_shortcut(x)


class CrossAttention(nn.Module):
    def __init__(self, c, ctx_d, heads):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(c, c, bias=False)
        self.to_k = nn.Linear(ctx_d, c, bias=False)
        self.to_v = nn.Linear(ctx_d, c, bias=False)
        self.to_out = nn.Linear(c, c)

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        q, k, v = self.to_q(x), self.to_k(ctx), self.to_v(ctx)
        b, mq, c = q.shape
        h = self.heads
        d = c // h
        q = q.reshape(b, mq, h, d).permute(0, 2, 1, 3)
        k = k.reshape(b, k.shape[1], h, d).permute(0, 2, 1, 3)
        v = v.reshape(b, v.shape[1], h, d).permute(0, 2, 1, 3)
        s = torch.matmul(q, k.transpose(-1, -2)) * (d ** -0.5)
        o = torch.matmul(torch.softmax(s, dim=-1), v)
        return self.to_out(o.permute(0, 2, 1, 3).reshape(b, mq, c))


class GEGLU(nn.Module):
    def __init__(self, c, inner):
        super().__init__()
        self.proj = nn.Linear(c, inner * 2)

    def forward(self, x):
        a, gate = self.proj(x).chunk(2, dim=-1)
        return a * F.gelu(gate)


class TransformerBlock(nn.Module):
    def __init__(self, c, ctx_d, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(c)
        self.attn1 = CrossAttention(c, c, heads)
        self.norm2 = nn.LayerNorm(c)
        self.attn2 = CrossAttention(c, ctx_d, heads)
        self.norm3 = nn.LayerNorm(c)
        self.ff = nn.Sequential(GEGLU(c, 4 * c), nn.Linear(4 * c, c))

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        return x + self.ff(self.norm3(x))


class SpatialTransformer(nn.Module):
    """diffusers Transformer2DModel, depth 1, linear_projection=False."""

    def __init__(self, c, ctx_d, heads):
        super().__init__()
        self.norm = nn.GroupNorm(32, c, eps=1e-6)
        self.proj_in = nn.Conv2d(c, c, 1)
        self.block = TransformerBlock(c, ctx_d, heads)
        self.proj_out = nn.Conv2d(c, c, 1)

    def forward(self, x, ctx):
        b, c, h, w = x.shape
        res = x
        x = self.proj_in(self.norm(x))
        x = x.reshape(b, c, h * w).permute(0, 2, 1)
        x = self.block(x, ctx)
        x = x.permute(0, 2, 1).reshape(b, c, h, w)
        return self.proj_out(x) + res


class SDUNet(nn.Module):
    """UNet2DConditionModel(runwayml/stable-diffusion-v1-5 config) shape-
    and op-mix-faithful rebuild. `width` scales every channel count (1.0 =
    the real 860M model; the slow test uses 0.1)."""

    def __init__(self, width: float = 1.0, ctx_d: int = 768, heads: int = 8):
        super().__init__()
        ch = [max(32, int(round(c * width / 32) * 32)) for c in (320, 640, 1280, 1280)]
        self.ch = ch
        temb = ch[0] * 4
        self.time_fc1 = nn.Linear(ch[0], temb)
        self.time_fc2 = nn.Linear(temb, temb)
        self.conv_in = nn.Conv2d(4, ch[0], 3, padding=1)

        # down: CrossAttnDownBlock2D x3 + DownBlock2D
        self.down_res = nn.ModuleList()
        self.down_attn = nn.ModuleList()
        self.downsamplers = nn.ModuleList()
        cin = ch[0]
        for li, c in enumerate(ch):
            for _ in range(2):
                self.down_res.append(Resnet(cin, c, temb))
                self.down_attn.append(
                    SpatialTransformer(c, ctx_d, heads) if li < 3 else nn.Identity()
                )
                cin = c
            if li < 3:
                self.downsamplers.append(nn.Conv2d(c, c, 3, stride=2, padding=1))

        self.mid_res1 = Resnet(ch[3], ch[3], temb)
        self.mid_attn = SpatialTransformer(ch[3], ctx_d, heads)
        self.mid_res2 = Resnet(ch[3], ch[3], temb)

        # up: UpBlock2D + CrossAttnUpBlock2D x3, 3 resnets each, skip concat
        self.up_res = nn.ModuleList()
        self.up_attn = nn.ModuleList()
        self.upsamplers = nn.ModuleList()
        rev = list(reversed(ch))  # 1280, 1280, 640, 320
        prev = ch[3]
        for li, c in enumerate(rev):
            skips = [rev[li]] * 2 + [rev[min(li + 1, 3)]]
            for bi in range(3):
                self.up_res.append(Resnet(prev + skips[bi], c, temb))
                self.up_attn.append(
                    SpatialTransformer(c, ctx_d, heads) if li > 0 else nn.Identity()
                )
                prev = c
            if li < 3:
                self.upsamplers.append(nn.Conv2d(c, c, 3, padding=1))

        self.norm_out = nn.GroupNorm(32, ch[0])
        self.conv_out = nn.Conv2d(ch[0], 4, 3, padding=1)

    def time_embedding(self, t):
        half = self.ch[0] // 2
        freqs = torch.exp(
            -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
        )
        ang = t[:, None] * freqs[None]
        return torch.cat([torch.cos(ang), torch.sin(ang)], dim=-1)

    def forward(self, sample, timestep, context):
        temb = self.time_fc2(F.silu(self.time_fc1(self.time_embedding(timestep))))
        h = self.conv_in(sample)
        skips = [h]
        ri = 0
        for li in range(4):
            for _ in range(2):
                h = self.down_res[ri](h, temb)
                attn = self.down_attn[ri]
                if not isinstance(attn, nn.Identity):
                    h = attn(h, context)
                skips.append(h)
                ri += 1
            if li < 3:
                h = self.downsamplers[li](h)
                skips.append(h)
        h = self.mid_res2(self.mid_attn(self.mid_res1(h, temb), context), temb)
        ri = 0
        for li in range(4):
            for _ in range(3):
                h = torch.cat([h, skips.pop()], dim=1)
                h = self.up_res[ri](h, temb)
                attn = self.up_attn[ri]
                if not isinstance(attn, nn.Identity):
                    h = attn(h, context)
                ri += 1
            if li < 3:
                h = F.interpolate(h, scale_factor=2.0, mode="nearest")
                h = self.upsamplers[li](h)
        return self.conv_out(F.silu(self.norm_out(h)))


def param_count(m: nn.Module) -> int:
    return sum(p.numel() for p in m.parameters())


def export_onnx(model: nn.Module, lat: int = 64, ctx_len: int = 77, ctx_d: int = 768) -> bytes:
    """torch.onnx.export to bytes (the golden-latents onnx-free hook)."""
    import io

    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    onnx_proto_utils._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes

    sample = torch.zeros(1, 4, lat, lat)
    timestep = torch.zeros(1)
    context = torch.zeros(1, ctx_len, ctx_d)
    buf = io.BytesIO()
    torch.onnx.export(
        model.eval(), (sample, timestep, context), buf,
        input_names=["sample", "timestep", "encoder_hidden_states"],
        output_names=["out_sample"], opset_version=14, dynamo=False,
    )
    return buf.getvalue()


if __name__ == "__main__":
    m = SDUNet(width=1.0)
    print(f"params: {param_count(m)/1e6:.1f}M")
