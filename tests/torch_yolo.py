"""Independent PyTorch oracle of YOLO11-seg — tests only.

A from-scratch torch implementation of the network the reference drives via
ultralytics (`yolo11x-seg.pt`, `/root/reference/2cam/2cams_mask_gpu.py:51`),
written to be **state_dict-compatible** with real ultralytics checkpoints
(same module tree, same parameter names, same BN eps/momentum). It exists to
cross-validate the JAX port (`rt3d/models/yolo/model.py`) and the converter
(`rt3d/models/yolo/convert.py`) end to end:

    torch.save({'model': SegModel(...)})  ->  convert_checkpoint  ->
    JAX forward  ==  torch forward        (same weights, same input)

Because the two implementations live in different frameworks with different
layouts (NCHW/OIHW vs NHWC/HWIO), agreement catches transposed kernels,
wrong channel splits, wrong activations, BN-folding errors and head-wiring
mistakes — the failure modes that structural shape checks cannot see.
(Real published checkpoints cannot be fetched in this environment; this
oracle is the strongest available substitute and also validates the exact
checkpoint *format* torch.save produces.)
"""

from __future__ import annotations

import math
from typing import Tuple

import torch
import torch.nn as nn

# (depth, width, max_channels) — ultralytics yolo11 scales
SCALES = {
    "n": (0.50, 0.25, 1024),
    "s": (0.50, 0.50, 1024),
    "m": (0.50, 1.00, 512),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.50, 512),
}


def make_divisible(x: float, divisor: int = 8) -> int:
    return int(math.ceil(x / divisor) * divisor)


class Conv(nn.Module):
    """Conv2d + BatchNorm2d(eps=1e-3, momentum=0.03) + SiLU."""

    def __init__(self, c1, c2, k=1, s=1, g=1, act=True):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, k // 2, groups=g, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = nn.SiLU() if act else nn.Identity()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class DWConv(Conv):
    def __init__(self, c1, c2, k=3, s=1, act=True):
        super().__init__(c1, c2, k, s, g=math.gcd(c1, c2), act=act)


class Bottleneck(nn.Module):
    def __init__(self, c1, c2, shortcut=True, g=1, k=(3, 3), e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = Conv(c1, c_, k[0], 1)
        self.cv2 = Conv(c_, c2, k[1], 1, g=g)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class C3k(nn.Module):
    """C3 whose bottlenecks use (k, k) kernels and e=1.0."""

    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5, k=3):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv(c1, c_, 1, 1)
        self.cv3 = Conv(2 * c_, c2, 1)
        self.m = nn.Sequential(
            *(Bottleneck(c_, c_, shortcut, g, k=(k, k), e=1.0) for _ in range(n))
        )

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class C3k2(nn.Module):
    """C2f whose inner blocks are C3k (c3k=True) or plain Bottlenecks."""

    def __init__(self, c1, c2, n=1, c3k=False, e=0.5, g=1, shortcut=True):
        super().__init__()
        self.c = int(c2 * e)
        self.cv1 = Conv(c1, 2 * self.c, 1, 1)
        self.cv2 = Conv((2 + n) * self.c, c2, 1)
        self.m = nn.ModuleList(
            C3k(self.c, self.c, 2, shortcut, g) if c3k
            else Bottleneck(self.c, self.c, shortcut, g)
            for _ in range(n)
        )

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class SPPF(nn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv(c_ * 4, c2, 1, 1)
        self.m = nn.MaxPool2d(kernel_size=k, stride=1, padding=k // 2)

    def forward(self, x):
        y = [self.cv1(x)]
        y.extend(self.m(y[-1]) for _ in range(3))
        return self.cv2(torch.cat(y, 1))


class Attention(nn.Module):
    def __init__(self, dim, num_heads=8, attn_ratio=0.5):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.key_dim = int(self.head_dim * attn_ratio)
        self.scale = self.key_dim ** -0.5
        nh_kd = self.key_dim * num_heads
        h = dim + nh_kd * 2
        self.qkv = Conv(dim, h, 1, act=False)
        self.proj = Conv(dim, dim, 1, act=False)
        self.pe = Conv(dim, dim, 3, 1, g=dim, act=False)

    def forward(self, x):
        b, c, hh, ww = x.shape
        n = hh * ww
        qkv = self.qkv(x)
        q, k, v = qkv.view(
            b, self.num_heads, self.key_dim * 2 + self.head_dim, n
        ).split([self.key_dim, self.key_dim, self.head_dim], dim=2)
        attn = (q.transpose(-2, -1) @ k) * self.scale
        attn = attn.softmax(dim=-1)
        x = (v @ attn.transpose(-2, -1)).view(b, c, hh, ww) + self.pe(
            v.reshape(b, c, hh, ww)
        )
        return self.proj(x)


class PSABlock(nn.Module):
    def __init__(self, c, attn_ratio=0.5, num_heads=4):
        super().__init__()
        self.attn = Attention(c, num_heads=num_heads, attn_ratio=attn_ratio)
        self.ffn = nn.Sequential(Conv(c, c * 2, 1), Conv(c * 2, c, 1, act=False))

    def forward(self, x):
        x = x + self.attn(x)
        return x + self.ffn(x)


class C2PSA(nn.Module):
    def __init__(self, c1, c2, n=1, e=0.5):
        super().__init__()
        assert c1 == c2
        self.c = int(c1 * e)
        self.cv1 = Conv(c1, 2 * self.c, 1, 1)
        self.cv2 = Conv(2 * self.c, c1, 1)
        self.m = nn.Sequential(
            *(PSABlock(self.c, attn_ratio=0.5, num_heads=self.c // 64)
              for _ in range(n))
        )

    def forward(self, x):
        a, b = self.cv1(x).split((self.c, self.c), dim=1)
        return self.cv2(torch.cat((a, self.m(b)), 1))


class Proto(nn.Module):
    def __init__(self, c1, c_=256, c2=32):
        super().__init__()
        self.cv1 = Conv(c1, c_, k=3)
        self.upsample = nn.ConvTranspose2d(c_, c_, 2, 2, 0, bias=True)
        self.cv2 = Conv(c_, c_, k=3)
        self.cv3 = Conv(c_, c2)

    def forward(self, x):
        return self.cv3(self.cv2(self.upsample(self.cv1(x))))


class DFL(nn.Module):
    """Distribution Focal Loss decoder: softmax over reg_max bins -> conv
    with fixed arange weights (expectation)."""

    def __init__(self, c1=16):
        super().__init__()
        self.conv = nn.Conv2d(c1, 1, 1, bias=False).requires_grad_(False)
        self.conv.weight.data[:] = torch.arange(c1, dtype=torch.float).view(
            1, c1, 1, 1
        )
        self.c1 = c1

    def forward(self, x):
        b, _, a = x.shape
        return self.conv(
            x.view(b, 4, self.c1, a).transpose(2, 1).softmax(1)
        ).view(b, 4, a)


class Segment(nn.Module):
    """Detect (YOLO11 non-legacy cv3) + mask-coefficient branch + Proto."""

    def __init__(self, ch: Tuple[int, int, int], nc=80, nm=32, npr=256,
                 reg_max=16):
        super().__init__()
        self.nc, self.nm, self.npr, self.reg_max = nc, nm, npr, reg_max
        c2 = max(16, ch[0] // 4, reg_max * 4)
        c3 = max(ch[0], min(nc, 100))
        c4 = max(ch[0] // 4, nm)
        self.cv2 = nn.ModuleList(
            nn.Sequential(Conv(x, c2, 3), Conv(c2, c2, 3),
                          nn.Conv2d(c2, 4 * reg_max, 1))
            for x in ch
        )
        self.cv3 = nn.ModuleList(
            nn.Sequential(
                nn.Sequential(DWConv(x, x, 3), Conv(x, c3, 1)),
                nn.Sequential(DWConv(c3, c3, 3), Conv(c3, c3, 1)),
                nn.Conv2d(c3, nc, 1),
            )
            for x in ch
        )
        self.cv4 = nn.ModuleList(
            nn.Sequential(Conv(x, c4, 3), Conv(c4, c4, 3),
                          nn.Conv2d(c4, nm, 1))
            for x in ch
        )
        self.proto = Proto(ch[0], npr, nm)
        self.dfl = DFL(reg_max)

    def forward(self, feats):
        protos = self.proto(feats[0])
        box, cls, mc = [], [], []
        for i, f in enumerate(feats):
            b = f.shape[0]
            # (B, C, H, W) -> (B, N, C), row-major HW flatten
            box.append(self.cv2[i](f).flatten(2).transpose(1, 2))
            cls.append(self.cv3[i](f).flatten(2).transpose(1, 2))
            mc.append(self.cv4[i](f).flatten(2).transpose(1, 2))
        return (
            torch.cat(box, 1),   # (B, A, 4*reg_max)
            torch.cat(cls, 1),   # (B, A, nc)
            torch.cat(mc, 1),    # (B, A, nm)
            protos,              # (B, nm, H/4, W/4)
        )


class SegModel(nn.Module):
    """Full yolo11{variant}-seg with ultralytics state_dict key naming
    (`model.0.conv.weight` ... `model.23.proto.cv3.conv.weight`)."""

    def __init__(self, variant="n", nc=80, nm=32):
        super().__init__()
        gd, gw, mc = SCALES[variant]

        def w(c):
            return make_divisible(min(c, mc) * gw, 8)

        def d(n):
            return max(round(n * gd), 1)

        mlx = variant in "mlx"
        up = lambda: nn.Upsample(scale_factor=2, mode="nearest")  # noqa: E731
        self.model = nn.ModuleList([
            Conv(3, w(64), 3, 2),                                   # 0
            Conv(w(64), w(128), 3, 2),                              # 1
            C3k2(w(128), w(256), d(2), mlx, 0.25),                  # 2
            Conv(w(256), w(256), 3, 2),                             # 3
            C3k2(w(256), w(512), d(2), mlx, 0.25),                  # 4
            Conv(w(512), w(512), 3, 2),                             # 5
            C3k2(w(512), w(512), d(2), True, 0.5),                  # 6
            Conv(w(512), w(1024), 3, 2),                            # 7
            C3k2(w(1024), w(1024), d(2), True, 0.5),                # 8
            SPPF(w(1024), w(1024), 5),                              # 9
            C2PSA(w(1024), w(1024), d(2)),                          # 10
            up(),                                                   # 11
            nn.Identity(),                                          # 12 Concat
            C3k2(w(1024) + w(512), w(512), d(2), mlx),              # 13
            up(),                                                   # 14
            nn.Identity(),                                          # 15 Concat
            C3k2(w(512) + w(512), w(256), d(2), mlx),               # 16
            Conv(w(256), w(256), 3, 2),                             # 17
            nn.Identity(),                                          # 18 Concat
            C3k2(w(256) + w(512), w(512), d(2), mlx),               # 19
            Conv(w(512), w(512), 3, 2),                             # 20
            nn.Identity(),                                          # 21 Concat
            C3k2(w(512) + w(1024), w(1024), d(2), True),            # 22
            Segment((w(256), w(512), w(1024)), nc, nm, w(256)),     # 23
        ])

    def forward(self, x):
        m = self.model
        x = m[1](m[0](x))
        x = m[2](x)
        x = m[3](x)
        p3 = m[4](x)
        x = m[5](p3)
        p4 = m[6](x)
        x = m[7](p4)
        x = m[8](x)
        x = m[9](x)
        p5 = m[10](x)
        u = torch.cat((m[11](p5), p4), 1)
        h13 = m[13](u)
        u = torch.cat((m[14](h13), p3), 1)
        h16 = m[16](u)
        u = torch.cat((m[17](h16), h13), 1)
        h19 = m[19](u)
        u = torch.cat((m[20](h19), p5), 1)
        h22 = m[22](u)
        return m[23]((h16, h19, h22))

    def decode_boxes(self, box_logits: torch.Tensor, input_hw, strides=(8, 16, 32)):
        """DFL expectation + dist2bbox at anchor centers -> xyxy pixels."""
        dfl = self.model[23].dfl
        dist = dfl(box_logits.transpose(1, 2))  # (B, 4, A)
        h, w = input_hw
        centers = []
        for s in strides:
            ys, xs = torch.meshgrid(
                torch.arange(h // s, dtype=torch.float32),
                torch.arange(w // s, dtype=torch.float32),
                indexing="ij",
            )
            c = torch.stack([xs + 0.5, ys + 0.5], -1).view(-1, 2) * s
            centers.append(c)
        anc = torch.cat(centers, 0).T[None]  # (1, 2, A)
        sv = torch.cat([
            torch.full(((h // s) * (w // s),), float(s)) for s in strides
        ])[None, None]
        lt, rb = dist[:, :2] * sv, dist[:, 2:] * sv
        return torch.cat([anc - lt, anc + rb], 1).transpose(1, 2)  # (B,A,4)


def populate_bn_stats(model: nn.Module, seed: int = 0, steps: int = 3,
                      hw=(64, 96)) -> None:
    """Give BatchNorms realistic (non-identity) running stats by streaming a
    few random batches in train mode — a converted checkpoint with trivial
    stats would not exercise the BN-folding math."""
    g = torch.Generator().manual_seed(seed)
    model.train()
    with torch.no_grad():
        for _ in range(steps):
            x = torch.rand((2, 3, *hw), generator=g)
            model(x)
    model.eval()
