"""YOLO11-seg: a ground-up functional JAX implementation.

Re-implements the YOLO11 instance-segmentation network the reference drives
through ultralytics (`yolo11x-seg.pt` at `2cam/2cams_mask_gpu.py:51`,
`yolo11l-seg.pt` at `1cam/rt-tracking.py:78`): C3k2 backbone, SPPF, C2PSA
attention stage, PAN-FPN head, decoupled Detect head with DFL box regression
and a 32-coefficient prototype mask head (Segment).

Layout is NHWC / HWIO (TPU-native); compute is bfloat16 with f32 MXU
accumulation; every BatchNorm is folded into its conv at weight-conversion
time (see `convert.py`). Parameter paths mirror ultralytics module names so
checkpoint conversion is mechanical, e.g. layer 10's attention qkv lives at
``10/m/0/attn/qkv/conv/{kernel,bias}``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from rt3d.models.yolo.core import (
    ParamCtx,
    Params,
    compute_dtype,
    conv_module,
    conv_transpose2x,
    dwconv_module,
    head_conv2d,
    make_divisible,
    maxpool,
    upsample2x,
)


@dataclass(frozen=True)
class YoloScale:
    depth: float
    width: float
    max_channels: int


SCALES: Dict[str, YoloScale] = {
    "n": YoloScale(0.50, 0.25, 1024),
    "s": YoloScale(0.50, 0.50, 1024),
    "m": YoloScale(0.50, 1.00, 512),
    "l": YoloScale(1.00, 1.00, 512),
    "x": YoloScale(1.00, 1.50, 512),
}

STRIDES = (8, 16, 32)
REG_MAX = 16


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def bottleneck(ctx: ParamCtx, name: str, x: jax.Array, shortcut: bool,
               k: Tuple[int, int] = (3, 3), e: float = 0.5) -> jax.Array:
    c = x.shape[-1]
    hidden = int(c * e)
    with ctx.scope(name):
        y = conv_module(ctx, "cv1", x, hidden, k=k[0])
        y = conv_module(ctx, "cv2", y, c, k=k[1])
    return x + y if shortcut else y


def c3k(ctx: ParamCtx, name: str, x: jax.Array, cout: int, n: int = 2,
        shortcut: bool = True) -> jax.Array:
    c_ = int(cout * 0.5)
    with ctx.scope(name):
        a = conv_module(ctx, "cv1", x, c_, k=1)
        b = conv_module(ctx, "cv2", x, c_, k=1)
        with ctx.scope("m"):
            for i in range(n):
                a = bottleneck(ctx, str(i), a, shortcut and True, k=(3, 3), e=1.0)
        return conv_module(ctx, "cv3", jnp.concatenate([a, b], axis=-1), cout, k=1)


def c3k2(ctx: ParamCtx, name: str, x: jax.Array, cout: int, n: int,
         use_c3k: bool, e: float = 0.5, shortcut: bool = True) -> jax.Array:
    c = int(cout * e)
    with ctx.scope(name):
        y = conv_module(ctx, "cv1", x, 2 * c, k=1)
        parts: List[jax.Array] = [y[..., :c], y[..., c:]]
        with ctx.scope("m"):
            for i in range(n):
                if use_c3k:
                    parts.append(c3k(ctx, str(i), parts[-1], c, n=2, shortcut=shortcut))
                else:
                    parts.append(bottleneck(ctx, str(i), parts[-1], shortcut, k=(3, 3), e=0.5))
        return conv_module(ctx, "cv2", jnp.concatenate(parts, axis=-1), cout, k=1)


def sppf(ctx: ParamCtx, name: str, x: jax.Array, cout: int, k: int = 5) -> jax.Array:
    c_ = x.shape[-1] // 2
    with ctx.scope(name):
        y = conv_module(ctx, "cv1", x, c_, k=1)
        ys = [y]
        for _ in range(3):
            ys.append(maxpool(ys[-1], k, 1))
        return conv_module(ctx, "cv2", jnp.concatenate(ys, axis=-1), cout, k=1)


def attention(ctx: ParamCtx, name: str, x: jax.Array, num_heads: int,
              attn_ratio: float = 0.5) -> jax.Array:
    b, h, w, dim = x.shape
    head_dim = dim // num_heads
    key_dim = int(head_dim * attn_ratio)
    scale = key_dim ** -0.5
    n = h * w
    with ctx.scope(name):
        qkv = conv_module(ctx, "qkv", x, dim + 2 * key_dim * num_heads, k=1, act=False)
        qkv = qkv.reshape(b, n, num_heads, 2 * key_dim + head_dim)
        q = qkv[..., :key_dim]
        k = qkv[..., key_dim:2 * key_dim]
        v = qkv[..., 2 * key_dim:]
        attn = jnp.einsum(
            "bnhk,bmhk->bhnm", q, k, preferred_element_type=jnp.float32
        ) * scale
        attn = jax.nn.softmax(attn, axis=-1).astype(compute_dtype())
        out = jnp.einsum(
            "bhnm,bmhd->bnhd", attn, v, preferred_element_type=jnp.float32
        ).astype(compute_dtype())
        out = out.reshape(b, h, w, dim)
        v_img = v.reshape(b, h, w, dim)
        pe = conv_module(ctx, "pe", v_img, dim, k=3, groups=dim, act=False)
        return conv_module(ctx, "proj", out + pe, dim, k=1, act=False)


def psa_block(ctx: ParamCtx, name: str, x: jax.Array, num_heads: int) -> jax.Array:
    c = x.shape[-1]
    with ctx.scope(name):
        x = x + attention(ctx, "attn", x, num_heads)
        with ctx.scope("ffn"):
            y = conv_module(ctx, "0", x, c * 2, k=1)
            y = conv_module(ctx, "1", y, c, k=1, act=False)
        return x + y


def c2psa(ctx: ParamCtx, name: str, x: jax.Array, n: int) -> jax.Array:
    c1 = x.shape[-1]
    c = int(c1 * 0.5)
    with ctx.scope(name):
        y = conv_module(ctx, "cv1", x, 2 * c, k=1)
        a, b = y[..., :c], y[..., c:]
        with ctx.scope("m"):
            for i in range(n):
                b = psa_block(ctx, str(i), b, num_heads=c // 64)
        return conv_module(ctx, "cv2", jnp.concatenate([a, b], axis=-1), c1, k=1)


def proto(ctx: ParamCtx, name: str, x: jax.Array, c_: int, cout: int) -> jax.Array:
    with ctx.scope(name):
        y = conv_module(ctx, "cv1", x, c_, k=3)
        y = conv_transpose2x(ctx, "upsample", y, c_)
        y = conv_module(ctx, "cv2", y, c_, k=3)
        return conv_module(ctx, "cv3", y, cout, k=1)


# ---------------------------------------------------------------------------
# Full network
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class YoloSeg:
    """Static architecture description + forward/init entry points."""

    variant: str = "x"
    num_classes: int = 80
    num_mask_coeffs: int = 32
    input_hw: Tuple[int, int] = (384, 640)

    @property
    def scale(self) -> YoloScale:
        return SCALES[self.variant]

    def _w(self, c: int) -> int:
        s = self.scale
        return make_divisible(min(c, s.max_channels) * s.width, 8)

    def _d(self, n: int) -> int:
        return max(round(n * self.scale.depth), 1)

    @property
    def level_channels(self) -> Tuple[int, int, int]:
        return (self._w(256), self._w(512), self._w(1024))

    @property
    def num_anchors(self) -> int:
        h, w = self.input_hw
        return sum((h // s) * (w // s) for s in STRIDES)

    # -- forward ----------------------------------------------------------

    def backbone_neck(self, ctx: ParamCtx, x: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
        w, d = self._w, self._d
        mlx = self.variant in ("m", "l", "x")  # parse_model flips c3k on

        x = conv_module(ctx, "0", x, w(64), k=3, s=2)
        x = conv_module(ctx, "1", x, w(128), k=3, s=2)
        x = c3k2(ctx, "2", x, w(256), n=d(2), use_c3k=mlx, e=0.25)
        x = conv_module(ctx, "3", x, w(256), k=3, s=2)
        p3 = c3k2(ctx, "4", x, w(512), n=d(2), use_c3k=mlx, e=0.25)
        x = conv_module(ctx, "5", p3, w(512), k=3, s=2)
        p4 = c3k2(ctx, "6", x, w(512), n=d(2), use_c3k=True, e=0.5)
        x = conv_module(ctx, "7", p4, w(1024), k=3, s=2)
        x = c3k2(ctx, "8", x, w(1024), n=d(2), use_c3k=True, e=0.5)
        x = sppf(ctx, "9", x, w(1024))
        p5 = c2psa(ctx, "10", x, n=d(2))

        # PAN-FPN head
        u = jnp.concatenate([upsample2x(p5), p4], axis=-1)            # 11,12
        h13 = c3k2(ctx, "13", u, w(512), n=d(2), use_c3k=mlx, e=0.5)
        u = jnp.concatenate([upsample2x(h13), p3], axis=-1)           # 14,15
        h16 = c3k2(ctx, "16", u, w(256), n=d(2), use_c3k=mlx, e=0.5)
        dn = conv_module(ctx, "17", h16, w(256), k=3, s=2)
        u = jnp.concatenate([dn, h13], axis=-1)                       # 18
        h19 = c3k2(ctx, "19", u, w(512), n=d(2), use_c3k=mlx, e=0.5)
        dn = conv_module(ctx, "20", h19, w(512), k=3, s=2)
        u = jnp.concatenate([dn, p5], axis=-1)                        # 21
        h22 = c3k2(ctx, "22", u, w(1024), n=d(2), use_c3k=True, e=0.5)
        return h16, h19, h22

    def head(self, ctx: ParamCtx, feats: Sequence[jax.Array]):
        """Segment head. Returns (box_logits (B,A,64), cls_logits (B,A,nc),
        mask_coeffs (B,A,nm), protos (B, H/4, W/4, nm))."""
        nc, nm = self.num_classes, self.num_mask_coeffs
        ch = [f.shape[-1] for f in feats]
        c2 = max(16, ch[0] // 4, REG_MAX * 4)
        c3_ = max(ch[0], min(nc, 100))
        c4 = max(ch[0] // 4, nm)
        npr = self._w(256)

        boxes, clss, coeffs = [], [], []
        with ctx.scope("23"):
            protos = proto(ctx, "proto", feats[0], npr, nm)
            for lvl, f in enumerate(feats):
                with ctx.scope("cv2"), ctx.scope(str(lvl)):
                    y = conv_module(ctx, "0", f, c2, k=3)
                    y = conv_module(ctx, "1", y, c2, k=3)
                    box = head_conv2d(ctx, "2", y, 4 * REG_MAX, k=1)
                with ctx.scope("cv3"), ctx.scope(str(lvl)):
                    with ctx.scope("0"):
                        y = dwconv_module(ctx, "0", f, f.shape[-1], k=3)
                        y = conv_module(ctx, "1", y, c3_, k=1)
                    with ctx.scope("1"):
                        y = dwconv_module(ctx, "0", y, c3_, k=3)
                        y = conv_module(ctx, "1", y, c3_, k=1)
                    cls = head_conv2d(ctx, "2", y, nc, k=1)
                with ctx.scope("cv4"), ctx.scope(str(lvl)):
                    y = conv_module(ctx, "0", f, c4, k=3)
                    y = conv_module(ctx, "1", y, c4, k=3)
                    mc = head_conv2d(ctx, "2", y, nm, k=1)
                b = box.shape[0]
                boxes.append(box.reshape(b, -1, 4 * REG_MAX))
                clss.append(cls.reshape(b, -1, nc))
                coeffs.append(mc.reshape(b, -1, nm))
        return (
            jnp.concatenate(boxes, axis=1).astype(jnp.float32),
            jnp.concatenate(clss, axis=1).astype(jnp.float32),
            jnp.concatenate(coeffs, axis=1).astype(jnp.float32),
            protos.astype(jnp.float32),
        )

    def forward_with_feats(self, params: Params, images: jax.Array):
        """Head outputs plus the three neck feature maps (P3/P4/P5) — the
        P3 map doubles as the appearance-embedding source for BoT-SORT."""
        ctx = ParamCtx(params=params)
        feats = self.backbone_neck(ctx, images.astype(compute_dtype()))
        return self.head(ctx, feats), feats

    def forward(self, params: Params, images: jax.Array):
        """images: (B, H, W, 3) float in [0,1] (letterboxed). Returns the
        raw head tuple — decode with `postprocess.decode_predictions`."""
        return self.forward_with_feats(params, images)[0]

    def param_shapes(self):
        """Shape-mode trace (no FLOPs): {path: (shape, fan_in)}."""
        ctx = ParamCtx()
        h, w = self.input_hw

        def f(x):
            feats = self.backbone_neck(ctx, x.astype(compute_dtype()))
            self.head(ctx, feats)
            return jnp.zeros(())

        jax.eval_shape(f, jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32))
        return ctx.shapes

    def init(self, rng: jax.Array) -> Params:
        from rt3d.models.yolo.core import materialize_params

        return materialize_params(self.param_shapes(), rng)


def yolo_seg(variant: str = "x", num_classes: int = 80,
             input_hw: Tuple[int, int] = (384, 640)) -> YoloSeg:
    return YoloSeg(variant=variant, num_classes=num_classes, input_hw=input_hw)
