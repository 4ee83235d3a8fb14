"""YOLO11-seg model structure, decode/NMS, and converter tests.

Kept small (variant "n", tiny input) — this box has one CPU core and XLA
compile time dominates.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rt3d.models.yolo import core as ycore
from rt3d.models.yolo.model import YoloSeg
from rt3d.models.yolo import convert as yconvert
from rt3d.models.yolo.postprocess import (
    anchor_grid,
    assemble_masks_retina,
    box_iou_matrix,
    boxes_to_original,
    decode_predictions,
    letterbox_params,
    nms_fixed,
    preprocess_frame,
)

TINY = YoloSeg(variant="n", num_classes=80, input_hw=(96, 160))


def test_param_shapes_structure():
    shapes = TINY.param_shapes()
    # ultralytics-mirroring paths exist
    for p in [
        "0/conv/kernel", "2/cv1/conv/kernel", "6/m/0/cv1/conv/kernel",
        "9/cv2/conv/kernel", "10/m/0/attn/qkv/conv/kernel",
        "10/m/0/ffn/0/conv/kernel", "13/cv2/conv/kernel",
        "23/proto/upsample/kernel", "23/cv2/0/2/kernel",
        "23/cv3/0/0/0/conv/kernel", "23/cv4/2/2/kernel",
    ]:
        assert p in shapes, p
    # n-scale stem: 3 -> 16 channels
    assert shapes["0/conv/kernel"][0] == (3, 3, 3, 16)
    # head output convs: 64 box regs, 80 classes, 32 coeffs
    assert shapes["23/cv2/0/2/kernel"][0][-1] == 64
    assert shapes["23/cv3/0/2/kernel"][0][-1] == 80
    assert shapes["23/cv4/0/2/kernel"][0][-1] == 32


def test_forward_shapes_and_decode():
    params = TINY.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 96, 160, 3), jnp.float32)
    box, cls, coeff, protos = jax.jit(TINY.forward)(params, x)
    a = TINY.num_anchors
    assert a == (12 * 20) + (6 * 10) + (3 * 5)
    assert box.shape == (1, a, 64)
    assert cls.shape == (1, a, 80)
    assert coeff.shape == (1, a, 32)
    assert protos.shape == (1, 24, 40, 32)

    boxes, scores = decode_predictions(TINY, box, cls)
    assert boxes.shape == (1, a, 4)
    assert scores.shape == (1, a, 80)
    assert bool(jnp.all(scores >= 0) & jnp.all(scores <= 1))
    # boxes from zero-ish logits: centred DFL mean = 7.5 strides each side
    pts, strides = anchor_grid(TINY.input_hw)
    assert pts.shape == (a, 2) and strides.shape == (a,)


def test_anchor_grid_layout():
    pts, strides = anchor_grid((96, 160))
    # first anchor of each level at (0.5, 0.5), stride blocks ordered 8,16,32
    assert np.allclose(pts[0], [0.5, 0.5])
    lvl0 = 12 * 20
    assert np.allclose(pts[lvl0], [0.5, 0.5])
    assert strides[0] == 8 and strides[lvl0] == 16 and strides[-1] == 32


def _nms_oracle(boxes, scores, classes, iou_t):
    # stable: equal scores keep index order, matching lax.top_k's
    # tie-breaking (matters for tie-heavy fuzz cases below)
    order = np.argsort(-scores, kind="stable")
    keep = []
    for i in order:
        if scores[i] <= 0:
            continue
        ok = True
        for j in keep:
            if classes[i] == classes[j]:
                # iou
                lt = np.maximum(boxes[i, :2], boxes[j, :2])
                rb = np.minimum(boxes[i, 2:], boxes[j, 2:])
                wh = np.maximum(rb - lt, 0)
                inter = wh[0] * wh[1]
                area = (
                    (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
                    + (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
                    - inter
                )
                if inter / max(area, 1e-9) > iou_t:
                    ok = False
                    break
        if ok:
            keep.append(i)
    return keep


def test_nms_matches_greedy_oracle(rng):
    a, nc = 64, 5
    centers = rng.uniform(20, 100, (a, 2))
    wh = rng.uniform(5, 30, (a, 2))
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], axis=-1).astype(np.float32)
    cls = rng.integers(0, nc, a)
    conf = rng.uniform(0, 1, a).astype(np.float32)
    scores = np.zeros((a, nc), np.float32)
    scores[np.arange(a), cls] = conf
    coeffs = rng.normal(size=(a, 4)).astype(np.float32)

    det = nms_fixed(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(coeffs),
        conf_thresh=0.25, iou_thresh=0.5, max_det=10, pre_topk=32,
    )
    conf_f = np.where(conf >= 0.25, conf, 0.0)
    keep = _nms_oracle(boxes, conf_f, cls, 0.5)[:10]
    got_idx = [int(np.argmin(np.abs(conf - s))) for s in np.asarray(det.scores) if s > 0]
    assert got_idx == keep


def test_nms_matches_oracle_with_ties_and_clusters(rng):
    """Tie-heavy clustered fuzz: quantized scores produce many exact score
    ties and dense conflict chains — the regime where the selection-round
    suppression (postprocess.py) must still match the classic greedy
    recurrence. Ties break by candidate index in both (stable oracle sort
    vs lax.top_k index order)."""
    for t in range(8):
        a, nc = 48, 3
        centers = rng.uniform(0, 60, (a, 2))
        wh = rng.uniform(5, 40, (a, 2))
        boxes = np.concatenate(
            [centers - wh / 2, centers + wh / 2], axis=-1).astype(np.float32)
        cls = rng.integers(0, nc, a)
        conf = (np.round(rng.uniform(0, 1, a) * 10) / 10).astype(np.float32)
        scores = np.zeros((a, nc), np.float32)
        scores[np.arange(a), cls] = conf
        det = nms_fixed(
            jnp.asarray(boxes), jnp.asarray(scores),
            jnp.asarray(np.zeros((a, 4), np.float32)),
            conf_thresh=0.25, iou_thresh=0.5, max_det=12, pre_topk=48,
        )
        conf_f = np.where(conf >= 0.25, conf, 0.0)
        keep = _nms_oracle(boxes, conf_f, cls, 0.5)[:12]
        got = [tuple(b) for b, v in
               zip(np.asarray(det.boxes), np.asarray(det.valid)) if v]
        want = [tuple(boxes[i]) for i in keep]
        assert got == want, t


def test_nms_class_filter(rng):
    boxes = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    scores = np.zeros((2, 80), np.float32)
    scores[0, 39] = 0.9   # allowed (bottle)
    scores[1, 0] = 0.95   # person — filtered out
    mask = np.zeros(80, bool)
    mask[[39, 41]] = True
    det = nms_fixed(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.zeros((2, 4)),
        conf_thresh=0.1, iou_thresh=0.5, max_det=5, pre_topk=2,
        class_mask=jnp.asarray(mask),
    )
    v = np.asarray(det.valid)
    assert v.sum() == 1 and int(det.classes[np.argmax(v)]) == 39


def test_letterbox_geometry():
    meta = letterbox_params((720, 1280), (384, 640))
    assert meta.ratio == 0.5
    assert meta.new_hw == (360, 640)
    assert meta.pad_top == 12 and meta.pad_left == 0

    frame = jnp.zeros((720, 1280, 3), jnp.uint8)
    img = preprocess_frame(frame, meta)
    assert img.shape == (384, 640, 3)
    pad_val = 114.0 / 255.0
    assert np.allclose(np.asarray(img[:12]), pad_val)
    assert np.allclose(np.asarray(img[-12:]), pad_val)
    assert np.allclose(np.asarray(img[12:372]), 0.0)

    # box round-trip: letterboxed -> original
    boxes = jnp.asarray([[0.0, 12.0, 640.0, 372.0]])
    orig = np.asarray(boxes_to_original(boxes, meta))
    np.testing.assert_allclose(orig[0], [0, 0, 1280, 720])


def test_preprocess_bf16_within_sensor_quantization():
    """`preprocess_dtype=bfloat16` must stay within two 8-bit input
    quantization steps (2/255) of the f32 letterbox everywhere — even on
    the adversarial case for bf16 interpolation (uniform noise, where
    every output sits near 0.5 with ~2^-8 relative rounding; measured
    worst case 1.11/255)."""
    rng = np.random.default_rng(3)
    meta = letterbox_params((96, 160), (48, 80))
    frame = jnp.asarray(rng.integers(0, 256, (96, 160, 3)), jnp.uint8)
    f32 = np.asarray(preprocess_frame(frame, meta), np.float32)
    b16 = np.asarray(
        preprocess_frame(frame, meta, dtype=jnp.bfloat16), np.float32)
    assert b16.shape == f32.shape
    assert np.abs(b16 - f32).max() < 2.0 / 255.0


def test_mask_assembly_shapes_and_crop():
    meta = letterbox_params((96, 160), (48, 80))
    protos = np.zeros((12, 20, 8), np.float32)
    protos[:, :, 0] = 6.0  # sigmoid(6) ~ 1 wherever coeff[0] = 1
    coeffs = np.zeros((3, 8), np.float32)
    coeffs[0, 0] = 1.0
    boxes = np.array([[10, 10, 60, 60], [0, 0, 0, 0], [0, 0, 0, 0]], np.float32)
    masks = assemble_masks_retina(
        jnp.asarray(protos), jnp.asarray(coeffs), jnp.asarray(boxes), meta
    )
    m = np.asarray(masks)
    assert m.shape == (3, 96, 160)
    assert m[0, 20, 20] and not m[0, 5, 5]  # inside box vs outside
    assert not m[1].any() and not m[2].any()


def test_mask_assembly_bf16_resize_boundary_band():
    """`resize_dtype=bfloat16` (ModelConfig.mask_resize_dtype) may flip a
    pixel only where the interpolated probability sits within bf16
    resolution of the 0.5 threshold — i.e. ON the f32 mask's boundary.
    Interior/exterior pixels must be identical."""
    rng = np.random.default_rng(0)
    meta = letterbox_params((96, 160), (48, 80))
    # realistic logit magnitudes: trained protos/coeffs produce O(5-10)
    # logits with smooth spatial structure
    protos = rng.normal(0.0, 2.0, (12, 20, 8)).astype(np.float32)
    coeffs = rng.normal(0.0, 1.0, (4, 8)).astype(np.float32)
    boxes = np.tile(np.array([[0, 0, 160, 96]], np.float32), (4, 1))

    m32 = np.asarray(assemble_masks_retina(
        jnp.asarray(protos), jnp.asarray(coeffs), jnp.asarray(boxes), meta))
    m16 = np.asarray(assemble_masks_retina(
        jnp.asarray(protos), jnp.asarray(coeffs), jnp.asarray(boxes), meta,
        resize_dtype=jnp.bfloat16))

    flips = m32 ^ m16
    assert flips.mean() < 0.01  # a thin band, not a different mask
    if flips.any():
        # every flipped pixel lies on the f32 boundary: its 3x3
        # neighborhood contains both mask and background
        d, ys, xs = np.nonzero(flips)
        for di, yi, xi in zip(d, ys, xs):
            nb = m32[di,
                     max(yi - 1, 0):yi + 2,
                     max(xi - 1, 0):xi + 2]
            assert nb.any() and not nb.all(), (di, yi, xi)


def test_conv_bn_fusion_matches_torch():
    torch = pytest.importorskip("torch")
    tnn = torch.nn
    torch.manual_seed(0)
    conv = tnn.Conv2d(4, 6, 3, stride=2, padding=1, bias=False)
    bn = tnn.BatchNorm2d(6, eps=yconvert.BN_EPS)
    bn.weight.data.uniform_(0.5, 1.5)
    bn.bias.data.uniform_(-0.2, 0.2)
    bn.running_mean.uniform_(-0.5, 0.5)
    bn.running_var.uniform_(0.5, 2.0)
    conv.eval(), bn.eval()

    x = torch.randn(1, 4, 8, 8)
    with torch.no_grad():
        want = tnn.functional.silu(bn(conv(x))).numpy()

    w_f, b_f = yconvert.fuse_conv_bn(
        conv.weight.detach().numpy(), bn.weight.detach().numpy(),
        bn.bias.detach().numpy(),
        bn.running_mean.numpy(), bn.running_var.numpy(),
    )
    ycore.set_compute_dtype(jnp.float32)
    try:
        ctx = ycore.ParamCtx(params={
            "c/conv/kernel": jnp.asarray(yconvert._oihw_to_hwio(w_f)),
            "c/conv/bias": jnp.asarray(b_f),
        })
        got = ycore.conv_module(ctx, "c", jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), 6, k=3, s=2)
    finally:
        ycore.set_compute_dtype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=2e-4, atol=2e-5
    )


def test_converter_roundtrip_covers_model():
    """Build a torch-style state dict from the model's own shape table via
    the inverse key transform, convert it, and require exact coverage."""
    shapes = TINY.param_shapes()
    sd = {}
    rng = np.random.default_rng(0)
    for path, (shape, _) in shapes.items():
        tkey = path.replace("/", ".")
        if path.endswith("/conv/kernel"):
            base = tkey[: -len(".conv.weight") + len(".weight") - len(".weight")]
            base = tkey[: -len(".weight")]  # "<...>.conv"
            mod = base[: -len(".conv")]
            o = shape[3]
            kh, kw, ig = shape[0], shape[1], shape[2]
            sd[f"{mod}.conv.weight"] = rng.normal(size=(o, ig, kh, kw)).astype(np.float32)
            sd[f"{mod}.bn.weight"] = rng.uniform(0.5, 1.5, o).astype(np.float32)
            sd[f"{mod}.bn.bias"] = rng.normal(size=o).astype(np.float32)
            sd[f"{mod}.bn.running_mean"] = rng.normal(size=o).astype(np.float32)
            sd[f"{mod}.bn.running_var"] = rng.uniform(0.5, 2.0, o).astype(np.float32)
            sd[f"{mod}.bn.num_batches_tracked"] = np.array(1)
        elif path.endswith("upsample/kernel"):
            mod = tkey[: -len(".kernel")]
            i, o = shape[2], shape[3]
            sd[f"{mod}.weight"] = rng.normal(size=(i, o, 2, 2)).astype(np.float32)
            sd[f"{mod}.bias"] = rng.normal(size=o).astype(np.float32)
        elif path.endswith("/kernel"):  # bare head conv2d
            mod = tkey[: -len(".kernel")]
            o, ig, kh, kw = shape[3], shape[2], shape[0], shape[1]
            sd[f"{mod}.weight"] = rng.normal(size=(o, ig, kh, kw)).astype(np.float32)
            sd[f"{mod}.bias"] = rng.normal(size=o).astype(np.float32)
    # the DFL fixed conv must be dropped by the converter
    sd["23.dfl.conv.weight"] = np.arange(16, dtype=np.float32).reshape(1, 16, 1, 1)

    params = yconvert.convert_state_dict(sd)
    yconvert.verify_against_model(params, TINY)  # raises on any mismatch


def test_cast_params_for_inference_bit_identical():
    """Pre-casting f32 kernels to the compute dtype at load time must be
    bit-identical to the per-step cast conv2d performs anyway
    (core.py cast_params_for_inference), across the full forward."""
    params = TINY.init(jax.random.PRNGKey(3))
    cast = ycore.cast_params_for_inference(params)
    # kernels moved to the compute dtype; biases stayed f32
    assert cast["0/conv/kernel"].dtype == ycore.compute_dtype()
    assert cast["0/conv/bias"].dtype == jnp.float32
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 96, 160, 3), jnp.float32)
    fwd = jax.jit(TINY.forward)
    a = fwd(params, x)
    b = fwd(cast, x)
    for got, want in zip(jax.tree_util.tree_leaves(b),
                         jax.tree_util.tree_leaves(a)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_cast_params_noop_at_f32():
    params = TINY.init(jax.random.PRNGKey(3))
    ycore.set_compute_dtype(jnp.float32)
    try:
        cast = ycore.cast_params_for_inference(params)
    finally:
        ycore.set_compute_dtype(jnp.bfloat16)
    assert cast is params


def test_suppress_center_duplicates_exact_greedy():
    """Post-NMS centre dedupe: score order wins, only SURVIVORS suppress
    (a chain A-B-C with A~B and B~C but A!~C keeps A and C), classes are
    respected, invalid slots never suppress."""
    import jax.numpy as jnp

    from rt3d.models.yolo.postprocess import (
        Detections, suppress_center_duplicates,
    )

    def box(cx, cy):
        return [cx - 10, cy - 10, cx + 10, cy + 10]

    boxes = jnp.asarray([
        box(100, 100),   # 0: survivor (best score)
        box(115, 100),   # 1: dup of 0 (15 px)
        box(130, 100),   # 2: 30 px from 0, 15 from killed 1 -> SURVIVES
        box(102, 100),   # 3: other class, same spot -> survives
        box(101, 99),    # 4: INVALID slot at same spot
        box(400, 400),   # 5: far away -> survives
    ], jnp.float32)
    det = Detections(
        boxes=boxes,
        scores=jnp.asarray([0.9, 0.8, 0.7, 0.6, 0.5, 0.4]),
        classes=jnp.asarray([39, 39, 39, 41, 39, 39], jnp.int32),
        coeffs=jnp.zeros((6, 4)),
        valid=jnp.asarray([True, True, True, True, False, True]),
    )
    out = suppress_center_duplicates(det, dist_px=20.0)
    assert np.asarray(out.valid).tolist() == [
        True, False, True, True, False, True]
    assert float(out.scores[1]) == 0.0
