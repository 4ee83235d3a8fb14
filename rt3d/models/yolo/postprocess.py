"""Static-shape YOLO post-processing: letterbox, DFL decode, NMS, masks.

Replaces the ultralytics predictor stack the reference calls through
`model.track(...)` (`2cam/vision_pipeline_utils.py:256-290`): letterbox
preprocessing, DFL box decoding, class-aware NMS, and `retina_masks=True`
prototype-mask assembly at full camera resolution — all with compile-time
shapes (fixed candidate count, fixed max detections) so the whole path lives
inside one jitted TPU program.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from rt3d.models.yolo.model import REG_MAX, STRIDES, YoloSeg


@struct.dataclass
class Detections:
    """Fixed-capacity detection set (slots are score-sorted; `valid` marks
    live slots). Boxes are xyxy in ORIGINAL camera-image pixels."""

    boxes: jax.Array    # (D, 4) f32
    scores: jax.Array   # (D,) f32
    classes: jax.Array  # (D,) int32
    coeffs: jax.Array   # (D, nm) f32 mask coefficients
    valid: jax.Array    # (D,) bool

    @property
    def capacity(self) -> int:
        return self.boxes.shape[0]


@dataclass(frozen=True)
class LetterboxMeta:
    """Static letterbox geometry for one (src_hw -> dst_hw) pair.

    Mirrors ultralytics LetterBox(auto=True): uniform scale = min ratio,
    symmetric padding to the stride-32 rectangle."""

    src_hw: Tuple[int, int]
    dst_hw: Tuple[int, int]
    ratio: float
    pad_top: int
    pad_left: int
    new_hw: Tuple[int, int]


def letterbox_params(src_hw: Tuple[int, int], dst_hw: Tuple[int, int]) -> LetterboxMeta:
    sh, sw = src_hw
    dh, dw = dst_hw
    r = min(dh / sh, dw / sw)
    nh, nw = round(sh * r), round(sw * r)
    pad_h, pad_w = dh - nh, dw - nw
    return LetterboxMeta(
        src_hw=src_hw, dst_hw=dst_hw, ratio=r,
        pad_top=pad_h // 2, pad_left=pad_w // 2, new_hw=(nh, nw),
    )


def preprocess_frame(frame_bgr: jax.Array, meta: LetterboxMeta,
                     dtype: jnp.dtype = jnp.float32) -> jax.Array:
    """(H, W, 3) BGR uint8 -> (dst_h, dst_w, 3) RGB in [0,1], letterboxed
    with the ultralytics 114-gray fill.

    `dtype=bfloat16` (ModelConfig.preprocess_dtype) runs the resize in
    half the HBM bytes at the MXU's native rate and feeds the bf16 conv
    stem without a cast. u8 values 0..255 are exact in bf16 (8
    significand bits); normalization + interpolation round at bf16's
    ~2^-8 relative resolution — within two 8-bit quantization steps of
    the f32 path even on noise inputs (tests/test_yolo_model.py), and
    the stem consumes bf16 either way."""
    img = frame_bgr[..., ::-1].astype(dtype) / jnp.asarray(255.0, dtype)
    nh, nw = meta.new_hw
    # NOTE(perf): a reshape-mean "fast path" for the exact-half scale was
    # tried and REVERTED (2026-08-17): the (nh,2,nw,2,3) reshape splits
    # the lane dimension and costs ~4 ms of relayout at 2x HD720 — 15x
    # the resize it replaced. jax.image.resize lowers to two clean
    # contraction passes (0.26 ms total).
    img = jax.image.resize(img, (nh, nw, 3), method="bilinear")
    dh, dw = meta.dst_hw
    pad_bottom = dh - nh - meta.pad_top
    pad_right = dw - nw - meta.pad_left
    return jnp.pad(
        img,
        ((meta.pad_top, pad_bottom), (meta.pad_left, pad_right), (0, 0)),
        constant_values=114.0 / 255.0,
    )


def anchor_grid(input_hw: Tuple[int, int]):
    """Anchor centre points (A, 2) in input pixels and strides (A,)."""
    pts, strs = [], []
    h, w = input_hw
    for s in STRIDES:
        gh, gw = h // s, w // s
        ys = (jnp.arange(gh, dtype=jnp.float32) + 0.5)
        xs = (jnp.arange(gw, dtype=jnp.float32) + 0.5)
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        pts.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
        strs.append(jnp.full((gh * gw,), float(s), jnp.float32))
    return jnp.concatenate(pts, axis=0), jnp.concatenate(strs, axis=0)


def decode_predictions(model: YoloSeg, box_logits: jax.Array, cls_logits: jax.Array):
    """DFL decode: (B, A, 4*16) logits -> xyxy boxes in letterboxed-input
    pixels; class logits -> sigmoid scores. Pure math, no thresholding."""
    b, a, _ = box_logits.shape
    anchors, strides = anchor_grid(model.input_hw)
    dist = jax.nn.softmax(box_logits.reshape(b, a, 4, REG_MAX), axis=-1)
    bins = jnp.arange(REG_MAX, dtype=jnp.float32)
    ltrb = jnp.einsum("bafr,r->baf", dist, bins)  # (B, A, 4) in stride units
    lt, rb = ltrb[..., :2], ltrb[..., 2:]
    x1y1 = (anchors[None] - lt) * strides[None, :, None]
    x2y2 = (anchors[None] + rb) * strides[None, :, None]
    boxes = jnp.concatenate([x1y1, x2y2], axis=-1)
    scores = jax.nn.sigmoid(cls_logits)
    return boxes, scores


def box_iou_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise IoU of xyxy boxes: (Na, 4) x (Nb, 4) -> (Na, Nb)."""
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms_fixed(
    boxes: jax.Array,            # (A, 4)
    scores: jax.Array,           # (A, nc)
    coeffs: jax.Array,           # (A, nm)
    conf_thresh: float,
    iou_thresh: float,
    max_det: int,
    pre_topk: int = 128,
    class_mask: jax.Array | None = None,  # (nc,) bool — allowed classes
) -> Detections:
    """Exact greedy class-aware NMS with static shapes.

    Single-label per anchor (ultralytics default): each anchor contributes
    its best allowed class. Top `pre_topk` candidates by confidence enter the
    O(pre_topk^2) greedy suppression; the `max_det` survivors come out.
    """
    if class_mask is not None:
        scores = jnp.where(class_mask[None, :], scores, 0.0)
    pre_topk = min(pre_topk, boxes.shape[0])
    best_cls = jnp.argmax(scores, axis=-1).astype(jnp.int32)
    best_conf = jnp.max(scores, axis=-1)
    ok = best_conf >= conf_thresh
    cand_score = jnp.where(ok, best_conf, 0.0)

    top_scores, top_idx = jax.lax.top_k(cand_score, pre_topk)  # sorted desc
    top_boxes = boxes[top_idx]
    top_cls = best_cls[top_idx]
    top_valid = top_scores > 0.0

    iou = box_iou_matrix(top_boxes, top_boxes)
    same_cls = top_cls[:, None] == top_cls[None, :]
    conflict = (iou > iou_thresh) & same_cls  # (K, K)

    # Greedy suppression in max_det SELECTION ROUNDS, not pre_topk
    # sequential keep-decisions: each round takes the best still-available
    # candidate (candidates are score-sorted, so the first available index
    # IS the best) and suppresses its lower-ranked conflicts. Only kept
    # items ever suppress, so this is bit-identical to the classic
    # keep[i]-in-order recurrence — whose first max_det keeps are exactly
    # what the top_k below selects — at ~6x fewer loop iterations
    # (TPU loop overhead dominates these tiny per-step bodies).
    order = jnp.arange(pre_topk)
    rounds = min(max_det, pre_topk)

    def round_body(carry, _):
        sup, keep = carry
        avail = top_valid & ~sup & ~keep
        i = jnp.argmax(avail)  # first True = highest-score available
        has = avail[i]
        keep = keep.at[i].set(keep[i] | has)
        sup = sup | (has & conflict[i, :] & (order > i))
        return (sup, keep), None

    zeros = jnp.zeros((pre_topk,), bool)
    (_, keep), _ = jax.lax.scan(round_body, (zeros, zeros), None,
                                length=rounds)

    final_scores = jnp.where(keep, top_scores, 0.0)
    k = min(max_det, pre_topk)
    sel_scores, sel = jax.lax.top_k(final_scores, k)
    pad = max_det - k
    return Detections(
        boxes=jnp.pad(top_boxes[sel], ((0, pad), (0, 0))),
        scores=jnp.pad(sel_scores, (0, pad)),
        classes=jnp.pad(top_cls[sel], (0, pad)),
        coeffs=jnp.pad(coeffs[top_idx][sel], ((0, pad), (0, 0))),
        valid=jnp.pad(sel_scores > 0.0, (0, pad)),
    )


def suppress_center_duplicates(det: Detections, dist_px: float) -> Detections:
    """Post-NMS same-class CENTRE-DISTANCE suppression (exact greedy in
    slot/score order, like the classic NMS recurrence — only survivors
    suppress, so chains cannot cascade past a live slot).

    Exists for in-environment-trained detectors: their near-duplicate
    boxes can sit below the NMS IoU gate (partial boxes on one object
    overlap < 0.45) yet share the object's centre; each survivor then
    becomes its own object slot downstream and multiplies the fused-SOR
    work (NOTES.md round-4 stretch attribution). The reference's
    COCO-trained model does not need this — `dedupe_center_px` defaults
    to 0 (off) for parity. Choose the radius below the closest REAL
    object separation (24 px at HD720 ~= 2.5 cm at 1 m)."""
    d = det.capacity
    cx = (det.boxes[:, 0] + det.boxes[:, 2]) * 0.5
    cy = (det.boxes[:, 1] + det.boxes[:, 3]) * 0.5
    d2 = (cx[:, None] - cx[None, :]) ** 2 + (cy[:, None] - cy[None, :]) ** 2
    same = det.classes[:, None] == det.classes[None, :]
    later = jnp.arange(d)[None, :] > jnp.arange(d)[:, None]
    conflict = (d2 <= jnp.float32(dist_px) ** 2) & same & later

    def body(alive, i):
        kill = alive[i] & conflict[i] & alive
        return alive & ~kill, None

    alive, _ = jax.lax.scan(body, det.valid, jnp.arange(d))
    return det.replace(valid=alive,
                       scores=jnp.where(alive, det.scores, 0.0))


def boxes_to_original(boxes: jax.Array, meta: LetterboxMeta) -> jax.Array:
    """Letterboxed-input xyxy -> original-image xyxy, clipped."""
    sh, sw = meta.src_hw
    shift = jnp.array(
        [meta.pad_left, meta.pad_top, meta.pad_left, meta.pad_top], jnp.float32
    )
    out = (boxes - shift) / meta.ratio
    lim = jnp.array([sw, sh, sw, sh], jnp.float32)
    return jnp.clip(out, 0.0, lim)


def assemble_masks_retina(
    protos: jax.Array,       # (Hp, Wp, nm) — stride-4 prototype maps
    coeffs: jax.Array,       # (D, nm)
    boxes_orig: jax.Array,   # (D, 4) xyxy in original-image pixels
    meta: LetterboxMeta,
    resize_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Full-resolution instance masks, the `retina_masks=True` path
    (ultralytics `process_mask_native`): sigmoid(coeff . proto), crop the
    letterbox padding, bilinear-upsample to the original image, crop to the
    box, threshold 0.5. Returns (D, H, W) bool.

    `resize_dtype=bfloat16` runs the upsample (the HBM-dominant op: the
    full-res (D, H, W) write is ~16x the proto-res read) in half the
    bytes at the MXU's native rate. Only pixels whose interpolated
    probability lands within bf16 resolution (~0.004) of the 0.5
    threshold can flip — a <=1 px band at mask boundaries; for the
    standard 8x upsample the interpolation weights (k/16) are exact in
    bf16, so the data rounding is the only error source."""
    hp, wp, nm = protos.shape
    d = coeffs.shape[0]
    logits = jnp.einsum(
        "dn,hwn->dhw", coeffs, protos, preferred_element_type=jnp.float32
    )
    m = jax.nn.sigmoid(logits).astype(resize_dtype)
    # strip letterbox padding at proto scale (static slicing)
    proto_stride = meta.dst_hw[0] // hp
    top = meta.pad_top // proto_stride
    left = meta.pad_left // proto_stride
    nh = meta.new_hw[0] // proto_stride
    nw = meta.new_hw[1] // proto_stride
    m = m[:, top:top + nh, left:left + nw]
    sh, sw = meta.src_hw
    m = jax.image.resize(m, (d, sh, sw), method="bilinear")
    # crop to boxes
    ys = jax.lax.broadcasted_iota(jnp.float32, (sh, sw), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (sh, sw), 1)
    x1, y1, x2, y2 = (boxes_orig[:, i][:, None, None] for i in range(4))
    inbox = (xs[None] >= x1) & (xs[None] < x2) & (ys[None] >= y1) & (ys[None] < y2)
    return (m > 0.5) & inbox
