"""Functional parameter store + conv primitives for the YOLO11 port.

Why not a Module framework: the converter must map ultralytics checkpoint
keys (e.g. ``model.10.m.0.attn.qkv.conv.weight``) onto our parameters 1:1.
A flat ``{path: array}`` pytree whose paths mirror the ultralytics module
tree makes the conversion a pure string transform (see ``convert.py``) and
keeps the forward pass a plain jit-able function of ``(params, x)``.

All convs here are the **fused inference form**: BatchNorm is folded into
the convolution weights/bias at load time (this is an inference engine; the
reference also only ever runs YOLO in eval mode, `2cams_mask_gpu.py:51`).
Compute flows in bfloat16 with float32 accumulation on the MXU.
"""

from __future__ import annotations

import math
from contextlib import contextmanager
from typing import Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]


class ParamCtx:
    """Walks the model graph either reading params (apply mode) or recording
    their shapes (shape mode, run under `jax.eval_shape` so no FLOPs are
    spent). Paths use '/' and mirror ultralytics module names."""

    def __init__(self, params: Optional[Params] = None):
        self.params = params
        self.shapes: Dict[str, tuple] = {}   # path -> (shape, fan_in)
        self._path = []
        # when set (a dict), conv2d records the max-|input| of every conv
        # into it as TRACED scalars keyed by conv path — return the dict
        # from the traced function to calibrate int8 activation scales
        # (see quant.py; the reference has no quantization — TPU-only win)
        self.act_stats: Optional[Dict[str, jax.Array]] = None
        # act-stat reducer: None records max-|x|; a float in (0, 100)
        # records that percentile of |x| instead (outlier-robust scales —
        # the int8 path saturates clipped activations at ±127, so a
        # tighter scale trades rare clipping for finer resolution)
        self.act_pct: Optional[float] = None
        # populated alongside act_stats: static per-conv metadata the
        # quantizer can filter on (currently just the group count)
        self.conv_meta: Dict[str, dict] = {}

    @contextmanager
    def scope(self, name: str):
        self._path.append(str(name))
        try:
            yield self
        finally:
            self._path.pop()

    def param(self, name: str, shape, fan_in: Optional[int] = None) -> jax.Array:
        path = "/".join(self._path + [name])
        if self.params is not None:
            p = self.params[path]
            assert tuple(p.shape) == tuple(shape), f"{path}: {p.shape} != {shape}"
            return p
        self.shapes[path] = (tuple(shape), fan_in)
        return jnp.zeros(shape, jnp.float32)


def materialize_params(shapes: Dict[str, tuple], rng: jax.Array) -> Params:
    """Random init (uniform fan-in bound, zeros for biases) for a shape dict
    collected by a ParamCtx shape-mode trace."""
    out: Params = {}
    for path, (shape, fan_in) in sorted(shapes.items()):
        if path.endswith("bias"):
            out[path] = jnp.zeros(shape, jnp.float32)
        else:
            key = jax.random.fold_in(rng, abs(hash(path)) % (2**31 - 1))
            fi = fan_in if fan_in is not None else np_prod(shape[:-1])
            bound = 1.0 / math.sqrt(max(fi, 1))
            out[path] = jax.random.uniform(key, shape, jnp.float32, -bound, bound)
    return out


def np_prod(xs) -> int:
    out = 1
    for x in xs:
        out *= int(x)
    return out


def cast_params_for_inference(params: Params) -> Params:
    """Pre-cast conv kernels to the compute dtype, once, at load time.

    ``conv2d`` casts every kernel to ``_COMPUTE_DTYPE`` inside the step
    (core.py:177), so with f32-stored weights XLA re-converts the whole
    weight set (~125 MB for yolo11x) on EVERY step — the round-3 chip
    trace attributed the largest non-conv fusion (0.45 ms of a 6.6 ms
    step) largely to these per-step converts. Casting here is
    bit-identical (the step consumed the bf16-rounded kernel either way)
    and also halves the kernels' HBM residency.

    Only ``*/kernel`` f32 leaves are touched: biases stay f32 because the
    int8 path's epilogue consumes them in f32 (conv2d quantized branch),
    and they are ~0.3% of the bytes; quantized leaves (``kernel_q8``,
    scales) are already in their final dtypes. No-op when the compute
    dtype is float32 (tests, training).
    """
    cd = _COMPUTE_DTYPE
    if cd == jnp.float32:
        return params
    return {
        k: (jnp.asarray(v).astype(cd)
            if k.endswith("/kernel") and jnp.asarray(v).dtype == jnp.float32
            else v)
        for k, v in params.items()
    }


# ---------------------------------------------------------------------------
# Primitives (NHWC, HWIO kernels)
# ---------------------------------------------------------------------------

_COMPUTE_DTYPE = jnp.bfloat16


def set_compute_dtype(dtype) -> None:
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = dtype


def compute_dtype():
    return _COMPUTE_DTYPE


def silu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


def conv2d(
    ctx: ParamCtx,
    name: str,
    x: jax.Array,
    cout: int,
    k: int = 1,
    s: int = 1,
    groups: int = 1,
    act: bool = True,
    raw: bool = False,
) -> jax.Array:
    """Fused Conv(+BN)+SiLU. ``raw=True`` models a bare nn.Conv2d head layer
    (bias, no activation) — same param layout, different ultralytics naming
    handled by the caller's scope."""
    cin = x.shape[-1]
    with ctx.scope(name):
        path = "/".join(ctx._path)
        if ctx.act_stats is not None:
            # calibration capture: per-conv max-|input| (or a percentile
            # of |x| when act_pct is set) as a traced scalar
            ax = jnp.abs(x.astype(jnp.float32))
            ctx.act_stats[path] = (
                jnp.max(ax) if ctx.act_pct is None
                else jnp.percentile(ax, ctx.act_pct)
            )
            ctx.conv_meta[path] = {"groups": groups}
        quantized = (
            ctx.params is not None and path + "/kernel_q8" in ctx.params
        )
        if quantized:
            kernel_q = ctx.params[path + "/kernel_q8"]      # int8 HWIO
            kernel_scale = ctx.params[path + "/kernel_scale"]  # (cout,) f32
            act_scale = ctx.params[path + "/act_scale"]     # () f32 max-|x|
        else:
            kernel = ctx.param("kernel", (k, k, cin // groups, cout), fan_in=k * k * cin // groups)
        bias = ctx.param("bias", (cout,))
    pad = k // 2
    if quantized:
        # W8A8 path (TPU MXU runs s8xs8->s32 at 2x the bf16 rate): weights
        # are pre-quantized per-output-channel (quant.py), activations
        # quantize per-tensor against the calibrated max-|x|. The rescale +
        # bias + SiLU epilogue stays f32 and fuses into the conv output.
        inv = 127.0 / act_scale
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) * inv), -127.0, 127.0
        ).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            xq,
            kernel_q,
            window_strides=(s, s),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * (kernel_scale * (act_scale / 127.0))
        y = y + bias.astype(jnp.float32)
        if act and not raw:
            y = silu(y)
        return y.astype(_COMPUTE_DTYPE)
    # preferred_element_type matches the operand dtype so the conv transpose
    # (gradient) rule stays dtype-consistent — mixed bf16 operands with an
    # f32 preferred type breaks `grad` (cotangent/operand dtype mismatch in
    # the transposed conv). The TPU MXU accumulates bf16 products in f32
    # internally regardless.
    y = jax.lax.conv_general_dilated(
        x.astype(_COMPUTE_DTYPE),
        kernel.astype(_COMPUTE_DTYPE),
        window_strides=(s, s),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=_COMPUTE_DTYPE,
        precision=jax.lax.Precision.HIGHEST,  # no-op for bf16 operands;
        # keeps f32 runs (tests, debugging) actually f32 on every backend
    )
    # The bias+SiLU epilogue runs in the compute dtype. The conv output is
    # already _COMPUTE_DTYPE; routing the epilogue through f32 (as earlier
    # revisions did) forces an upcast + full-resolution f32 elementwise
    # passes + downcast. The round-3 chip trace attributed 0.82 ms of
    # standalone `multiply` + 0.72 ms of `copy` in a 6.4 ms step to this
    # epilogue (NOTES.md). The output was rounded to _COMPUTE_DTYPE anyway,
    # so this costs at most one extra bf16 rounding per conv; f32 runs
    # (tests, training) are bit-identical to the old epilogue.
    y = y + bias.astype(y.dtype)
    if act and not raw:
        y = silu(y)
    return y.astype(_COMPUTE_DTYPE)


def conv_module(ctx: ParamCtx, name: str, x: jax.Array, cout: int, k: int = 1,
                s: int = 1, groups: int = 1, act: bool = True) -> jax.Array:
    """Ultralytics `Conv` block: conv + (folded) bn + SiLU. Param path is
    `<name>/conv/{kernel,bias}` to mirror `<name>.conv.weight` / folded bn."""
    with ctx.scope(name):
        return conv2d(ctx, "conv", x, cout, k=k, s=s, groups=groups, act=act)


def dwconv_module(ctx: ParamCtx, name: str, x: jax.Array, cout: int, k: int = 3,
                  s: int = 1, act: bool = True) -> jax.Array:
    """Ultralytics `DWConv`: depthwise (groups = gcd(cin, cout))."""
    g = math.gcd(x.shape[-1], cout)
    return conv_module(ctx, name, x, cout, k=k, s=s, groups=g, act=act)


def head_conv2d(ctx: ParamCtx, name: str, x: jax.Array, cout: int, k: int = 1) -> jax.Array:
    """Bare nn.Conv2d with bias, no act (detect-head output layers)."""
    return conv2d(ctx, name, x, cout, k=k, act=False)


def maxpool(x: jax.Array, k: int, s: int = 1) -> jax.Array:
    pad = k // 2
    return jax.lax.reduce_window(
        x,
        -jnp.inf if x.dtype in (jnp.float32, jnp.bfloat16) else jnp.finfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, s, s, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


def upsample2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbour 2x (ultralytics nn.Upsample(scale_factor=2))."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def conv_transpose2x(ctx: ParamCtx, name: str, x: jax.Array, cout: int) -> jax.Array:
    """ConvTranspose2d(k=2, s=2) as used by Proto.upsample — non-overlapping,
    so it is an einsum + pixel-shuffle reshape (exact, MXU-friendly)."""
    cin = x.shape[-1]
    with ctx.scope(name):
        kernel = ctx.param("kernel", (2, 2, cin, cout), fan_in=cin)  # (kh, kw, I, O)
        bias = ctx.param("bias", (cout,))
    b, h, w, _ = x.shape
    # output in the compute dtype, like every conv (core.py:203): the MXU
    # still accumulates in f32 internally, so this costs one bf16 rounding
    # — and halves the bytes of the pixel-shuffle relayout copy XLA emits
    # after the einsum (chip trace round 5: 0.081 ms f32 -> ~0.04 bf16).
    # f32 runs (tests, training) are unchanged: _COMPUTE_DTYPE is f32.
    y = jnp.einsum(
        "bhwi,pqio->bhpwqo",
        x.astype(_COMPUTE_DTYPE),
        kernel.astype(_COMPUTE_DTYPE),
        preferred_element_type=_COMPUTE_DTYPE,
        precision=jax.lax.Precision.HIGHEST,
    )
    y = y.reshape(b, h * 2, w * 2, cout)
    return y + bias.astype(y.dtype)


def make_divisible(x: float, divisor: int = 8) -> int:
    """Ultralytics channel rounding."""
    return int(math.ceil(x / divisor) * divisor)
