"""Post-training int8 quantization (W8A8) for the YOLO11 conv path.

The v5e MXU runs s8xs8->s32 at twice the bf16 rate, and the conv stack is
~half the fused step's device time — quantization is the one large perf
lever left after round 3's sort/layout work. The reference has no analog
(its torch path runs fp16); this is a TPU-native extension, strictly
opt-in: a quantized PARAMS DICT is the switch. `quantize_params` returns
a new params dict in which each quantized conv's f32 ``kernel`` is
replaced by three keys the conv primitive recognises
(`core.py conv2d`):

    <path>/kernel_q8      int8 HWIO, per-output-channel symmetric
    <path>/kernel_scale   (cout,) f32 dequant scales (max-|w|/127)
    <path>/act_scale      ()  f32 calibrated max-|input| of the conv

Nothing else changes: the same `YoloSeg.forward`, the same pipeline, the
same checkpoints machinery (int8 arrays round-trip through the .npz
format). Passing the ORIGINAL params runs the bf16 path bit-for-bit.

Calibration is activation max-|x| over representative frames, captured by
running the model's own forward with `ParamCtx.act_stats` set — the stats
come back as traced scalars so the capture runs jitted (one forward per
calibration frame).

Exclusions (accuracy-sensitive): the stem conv (`0/conv`, 3-channel
input, nothing to win) and — since round 4 — the ENTIRE neck + head
(module stages >= 16). The round-4 artifacts are trained with a
differentiable IoU box objective whose crisp box regression is
quantization-sensitive: with the neck quantized, weight rounding spreads
each object's box cluster wider than the NMS gate and the detector
emits ~8x duplicate detections (measured on the round-4 n artifact:
33 valid dets vs 4 fp on the same frame; backbone-only int8 restores
det-set parity — tests/test_quant.py). The backbone (stages 0-15) holds
the large-tensor conv FLOPs and still quantizes cleanly.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from rt3d.models.yolo.core import ParamCtx, Params, compute_dtype


def default_exclude(path: str) -> bool:
    """True for conv paths that must stay bf16 (see module docstring).
    `path` is the conv scope path, e.g. ``23/cv3/1/2`` or ``6/cv1/conv``."""
    parts = path.split("/")
    if parts[0] == "0":
        return True  # stem conv: 3-channel input, nothing to win
    try:
        if int(parts[0]) >= 16:
            return True  # neck + head: box-quality-sensitive (docstring)
    except ValueError:
        pass
    return False


def collect_act_scales(
    model, params: Params, calib_images: Iterable[jax.Array],
    meta_out: Optional[Dict[str, dict]] = None,
    pct: Optional[float] = None,
) -> Dict[str, float]:
    """Per-conv max-|input| over the calibration frames.

    `calib_images`: iterable of (B, H, W, 3) float arrays in [0, 1] — the
    same thing `model.forward` takes. Runs one jitted stats-forward per
    frame batch and maxes on the host. `meta_out`, if given, receives the
    static per-conv metadata (group counts) captured at trace time.
    `pct` (e.g. 99.9): record that percentile of |x| per frame instead of
    the max — outlier-robust scales; the conv path saturates clipped
    activations, so a tighter scale trades rare clipping for resolution
    on the bulk of the distribution."""

    @jax.jit
    def stats(params, images):
        ctx = ParamCtx(params=params)
        ctx.act_stats = {}
        ctx.act_pct = pct
        feats = model.backbone_neck(ctx, images.astype(compute_dtype()))
        model.head(ctx, feats)
        if meta_out is not None:
            # static (non-traced) values; harvested once at trace time
            meta_out.update(ctx.conv_meta)
        return ctx.act_stats

    out: Dict[str, float] = {}
    n = 0
    for images in calib_images:
        s = jax.device_get(stats(params, jnp.asarray(images)))
        n += 1
        for k, v in s.items():
            out[k] = max(out.get(k, 0.0), float(v))
    if n == 0:
        raise ValueError("calibration needs at least one frame batch")
    return out


def collect_conv_meta(model) -> Dict[str, dict]:
    """Static per-conv metadata (group counts) via eval_shape — no FLOPs,
    no params needed."""
    ctx = ParamCtx()
    ctx.act_stats = {}  # enables meta recording in conv2d
    h, w = model.input_hw

    def f(x):
        feats = model.backbone_neck(ctx, x.astype(compute_dtype()))
        model.head(ctx, feats)
        return jnp.zeros(())

    jax.eval_shape(f, jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32))
    return dict(ctx.conv_meta)


def quantize_params(
    model,
    params: Params,
    calib_images: Iterable[jax.Array],
    exclude=default_exclude,
    act_scales: Optional[Dict[str, float]] = None,
    exclude_grouped: Optional[bool] = None,
) -> Params:
    """Return a new params dict with int8 conv weights + scales.

    Convs whose path `exclude` rejects — or whose calibrated activation
    range degenerates to ~0 — keep their f32 kernel and run the bf16
    path unchanged. `exclude_grouped` additionally keeps every
    feature_group_count>1 conv (depthwise `pe`, head dwconvs) in bf16;
    default reads RT3D_QUANT_NO_GROUPED — an escape hatch in case a
    backend lacks int8 grouped-conv support (untestable off-chip)."""
    if exclude_grouped is None:
        import os

        exclude_grouped = bool(os.environ.get("RT3D_QUANT_NO_GROUPED"))
    meta: Dict[str, dict] = {}
    if act_scales is None:
        act_scales = collect_act_scales(model, params, calib_images,
                                        meta_out=meta)
    if exclude_grouped and not meta:
        # precomputed act_scales skip calibration; recover the group
        # counts from a FLOP-free shape-mode trace
        meta = collect_conv_meta(model)

    out: Params = {}
    quantized: List[str] = []
    for key, w in params.items():
        if not key.endswith("/kernel"):
            out[key] = w
            continue
        path = key[: -len("/kernel")]
        a = act_scales.get(path)
        if a is None or a < 1e-6 or exclude(path):
            out[key] = w
            continue
        if exclude_grouped and meta.get(path, {}).get("groups", 1) > 1:
            out[key] = w
            continue
        wf = np.asarray(jax.device_get(w), np.float32)  # (k, k, cin/g, cout)
        wmax = np.abs(wf).reshape(-1, wf.shape[-1]).max(axis=0)
        wscale = np.maximum(wmax, 1e-12) / 127.0
        wq = np.clip(np.rint(wf / wscale), -127, 127).astype(np.int8)
        out[path + "/kernel_q8"] = wq
        out[path + "/kernel_scale"] = wscale.astype(np.float32)
        out[path + "/act_scale"] = np.float32(a)
        quantized.append(path)
    if not quantized:
        raise ValueError("no conv layer was quantized (bad act_scales?)")
    # Commit the dict to device: the quantize math above runs in numpy, and
    # host-numpy leaves passed to a jitted step are re-uploaded on EVERY
    # dispatch (measured on the dev relay: 222 ms/step of DevicePut — the
    # whole int8 weight set per frame chunk, chip checklist [05]/[08]).
    return jax.device_put(out)


def is_quantized(params: Params) -> bool:
    return any(k.endswith("/kernel_q8") for k in params)


def weights_fingerprint(weights_path: str) -> str:
    """sha256 of the weights artifact, prefixed for format evolution."""
    import hashlib

    h = hashlib.sha256()
    with open(weights_path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return "sha256:" + h.hexdigest()


def save_act_scales(path: str, scales: Dict[str, float],
                    weights_path: Optional[str] = None,
                    calibration: Optional[dict] = None) -> None:
    """Writes `{"scales": {...}, "weights_fingerprint": ...}`. The
    fingerprint lets loaders reject a sidecar left stale by retraining —
    stale scales clip the new model's activations silently (no error,
    just degraded detections). `calibration` (e.g. {"mode": "pct",
    "pct": 99.9} or {"mode": "max"}) is recorded verbatim so a sidecar
    is self-describing when A/B-ing scale recipes."""
    import json

    doc: dict = {"scales": dict(sorted(scales.items()))}
    if weights_path is not None:
        doc["weights_fingerprint"] = weights_fingerprint(weights_path)
    if calibration is not None:
        doc["calibration"] = calibration
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)


def load_act_scales(path: str,
                    weights_path: Optional[str] = None
                    ) -> Optional[Dict[str, float]]:
    """Returns the scales, or None when `weights_path` is given and the
    sidecar's fingerprint doesn't match (callers then fall back to live
    calibration). Legacy sidecars (a bare {path: scale} dict, no
    fingerprint) load as-is."""
    import json
    import sys

    with open(path) as f:
        doc = json.load(f)
    if "scales" not in doc:  # legacy bare-dict format
        return {k: float(v) for k, v in doc.items()}
    fp = doc.get("weights_fingerprint")
    if fp and weights_path is not None:
        actual = weights_fingerprint(weights_path)
        if actual != fp:
            print(f"# {path}: stale sidecar (weights fingerprint "
                  f"{actual[:20]}... != recorded {fp[:20]}...); "
                  "recalibrating", file=sys.stderr)
            return None
    return {k: float(v) for k, v in doc["scales"].items()}


def sidecar_path(weights_path: str) -> str:
    """Conventional location of precomputed activation scales for a
    weights artifact: `<weights>.act_scales.json` next to the .npz.
    Precomputing (tools/calibrate_quant.py) spares deploy targets the
    extra stats-forward compile — on the dev relay that is minutes."""
    import os

    return os.path.splitext(weights_path)[0] + ".act_scales.json"


def synth_calib_batches(pipe, src, frames=(0, 7, 23, 41)) -> List[jax.Array]:
    """Preprocessed calibration batches from a frame source via the
    pipeline's own preprocessing (letterbox + scale) — calibrate on
    exactly what the deployed conv stack sees."""
    return [
        pipe.preprocess(jnp.asarray(src.get(f).rgb)) for f in frames
    ]
