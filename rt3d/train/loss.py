"""Detection + segmentation training objective for YOLO11-seg.

A straightforward dense objective over the static anchor grid (per-anchor
classification BCE, DFL-style box regression CE on assigned anchors, and
prototype-mask BCE). Deliberately simpler than ultralytics' task-aligned
assigner — rt3d's training path exists for fine-tuning and for exercising
sharded training end-to-end; the reference pipeline itself never trains.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from rt3d.models.yolo.model import REG_MAX, YoloSeg

PROTO_STRIDE = 4


def seg_detection_loss(
    model: YoloSeg,
    params,
    images: jax.Array,        # (B, H, W, 3)
    targets: Dict[str, jax.Array],
    num_mask_anchors: int = 32,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """targets:
    cls:    (B, A, nc)  {0,1} per-anchor class labels
    box:    (B, A, 4)   ltrb distances in stride units, clipped to REG_MAX-1
    box_w:  (B, A)      anchor assignment weights (0 = background)
    and then ONE of the two mask-supervision schemes:
    mask:   (B, hp, wp) {0,1} foreground map — legacy prototype-channel-0
            supervision (gradient-flow smoke tests), OR
    inst_id:   (B, A)           instance index per positive anchor (-1 bg)
    inst_mask: (B, M, hp, wp)   per-instance masks at proto resolution
    inst_box:  (B, M, 4)        xyxy boxes in letterboxed-input pixels
            — the real scheme: supervises sigmoid(coeff . proto) per
            positive anchor against its instance's mask, cropped to the
            instance box (the YOLACT / ultralytics mask objective), which
            is what makes `assemble_masks_retina` produce usable masks at
            inference time.
    """
    box_logits, cls_logits, coeffs, protos = model.forward(params, images)
    b, a, _ = cls_logits.shape

    # classification: sigmoid BCE over all anchors, normalized by the
    # positive count (the YOLOv8/11 normalizer: BCE.sum()/targets.sum()).
    # A plain mean drowns the ~1% positive anchors in background terms at
    # full input resolution and the model learns to score everything
    # below the confidence threshold.
    if "cls" in targets:
        cls_t = targets["cls"]
    else:
        # rebuild the dense one-hot on device from the compact per-anchor
        # instance assignment (the (A, nc) host array is dataset-dominant)
        cid = jnp.take_along_axis(
            targets["inst_cls"],
            jnp.clip(targets["inst_id"], 0, None), axis=1,
        )                                                       # (B, A)
        cls_t = (
            jax.nn.one_hot(cid, cls_logits.shape[-1], dtype=jnp.float32)
            * (targets["box_w"] > 0)[..., None]
        )
        # Quality-aligned score targets (the YOLOv8/TAL idea, round 4):
        # scale each positive's class target by its CURRENT box-regression
        # quality (IoU of the decoded DFL box vs the target box),
        # renormalized per instance so the best-aligned anchor always
        # carries target 1. With binary targets every positive anchor —
        # however badly it regresses — is pushed to score 1.0, and the
        # sloppy-box detections survive NMS as near-duplicate clusters
        # (the round-4 hard-domain diagnostic: 10+ saturated detections
        # per object). Quality weighting makes the score head RANK by box
        # quality, which is exactly what greedy NMS needs to dedupe.
        if "inst_mask" in targets:
            pred_iou = _pred_box_iou(box_logits, targets)
            cls_t = cls_t * _alignment_quality(
                jax.lax.stop_gradient(pred_iou), targets)[..., None]
    num_pos = jnp.maximum(jnp.sum(cls_t), 1.0)
    bce = jnp.sum(
        jnp.maximum(cls_logits, 0) - cls_logits * cls_t
        + jnp.log1p(jnp.exp(-jnp.abs(cls_logits)))
    ) / num_pos

    # box: cross-entropy of the DFL distribution against integer bin targets
    box_t = jnp.clip(targets["box"], 0, REG_MAX - 1 - 1e-3)
    logits = box_logits.reshape(b, a, 4, REG_MAX)
    logp = jax.nn.log_softmax(logits, axis=-1)
    lo = jnp.floor(box_t).astype(jnp.int32)
    hi = lo + 1
    w_hi = box_t - lo
    ce = -(
        jnp.take_along_axis(logp, lo[..., None], axis=-1)[..., 0] * (1 - w_hi)
        + jnp.take_along_axis(logp, hi[..., None], axis=-1)[..., 0] * w_hi
    )
    w = targets["box_w"]
    box_loss = jnp.sum(ce.mean(axis=-1) * w) / jnp.maximum(jnp.sum(w), 1.0)

    if "inst_mask" in targets:
        proto_loss = _instance_mask_loss(
            coeffs, protos, targets, num_mask_anchors
        )
        pred_iou = _pred_box_iou(box_logits, targets)  # XLA CSEs the dup
        # Differentiable IoU regression on the decoded boxes (round 4).
        # DFL cross-entropy alone trains each of the 4 edge DISTRIBUTIONS
        # toward its bin target but never optimizes box OVERLAP jointly —
        # ultralytics drives boxes primarily with a CIoU term (weight 7.5
        # vs DFL 1.5); without one, hard-domain boxes stayed sloppy
        # clusters that class-aware NMS could not merge (round-4 v1-v6
        # eval history in weights manifest / NOTES.md).
        iou_loss = jnp.sum((1.0 - pred_iou) * w) / jnp.maximum(
            jnp.sum(w), 1.0)
        loss = bce + box_loss + 2.5 * iou_loss + 0.5 * proto_loss
        return loss, {"cls": bce, "box": box_loss, "iou": iou_loss,
                      "proto": proto_loss}
    # legacy: BCE of the first prototype channel vs a foreground map
    proto_logit = protos[..., 0]
    m = targets["mask"]
    proto_loss = jnp.mean(
        jnp.maximum(proto_logit, 0) - proto_logit * m
        + jnp.log1p(jnp.exp(-jnp.abs(proto_logit)))
    )
    loss = bce + box_loss + 0.5 * proto_loss
    return loss, {"cls": bce, "box": box_loss, "proto": proto_loss}


def _pred_box_iou(box_logits: jax.Array, targets: Dict[str, jax.Array]
                  ) -> jax.Array:
    """(B, A) DIFFERENTIABLE IoU between the decoded (DFL-expectation)
    box and the target box at each anchor; 0 off-assignment. Both boxes
    span [-l, r] x [-t, b] around the anchor in stride units."""
    b, a, _ = box_logits.shape
    dist = jax.nn.softmax(box_logits.reshape(b, a, 4, REG_MAX), axis=-1)
    bins = jnp.arange(REG_MAX, dtype=jnp.float32)
    pred = jnp.einsum("bafr,r->baf", dist, bins)     # (B, A, 4) ltrb
    tgt = targets["box"]
    w = targets["box_w"]                              # (B, A) {0, 1}
    iw = jnp.minimum(pred[..., 0], tgt[..., 0]) + \
        jnp.minimum(pred[..., 2], tgt[..., 2])
    ih = jnp.minimum(pred[..., 1], tgt[..., 1]) + \
        jnp.minimum(pred[..., 3], tgt[..., 3])
    inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)
    area_p = (pred[..., 0] + pred[..., 2]) * (pred[..., 1] + pred[..., 3])
    area_t = (tgt[..., 0] + tgt[..., 2]) * (tgt[..., 1] + tgt[..., 3])
    return inter / jnp.maximum(area_p + area_t - inter, 1e-9) * w


def _alignment_quality(iou: jax.Array, targets: Dict[str, jax.Array]
                       ) -> jax.Array:
    """(B, A) stop-gradient quality in [0, 1] for each positive anchor:
    the anchor's box IoU divided by the per-INSTANCE maximum so every
    instance keeps one anchor at full target weight (no instance starves
    early in training when all its IoUs are small). Background 0."""
    w = targets["box_w"]
    # per-instance max (inst_id in [-1, M); -1 folds into slot 0 with
    # weight 0, so it cannot distort a real instance's max)
    m = targets["inst_mask"].shape[1]
    sid = jnp.clip(targets["inst_id"], 0, None)
    inst_max = jax.vmap(
        lambda q, s: jax.ops.segment_max(q, s, num_segments=m,
                                         indices_are_sorted=False)
    )(iou, sid)                                       # (B, M)
    denom = jnp.take_along_axis(inst_max, sid, axis=1)
    return jax.lax.stop_gradient(
        jnp.where(w > 0, iou / jnp.maximum(denom, 1e-6), 0.0))


def _bce(logit: jax.Array, target: jax.Array) -> jax.Array:
    return (jnp.maximum(logit, 0) - logit * target
            + jnp.log1p(jnp.exp(-jnp.abs(logit))))


def _instance_mask_loss(
    coeffs: jax.Array,   # (B, A, nm)
    protos: jax.Array,   # (B, hp, wp, nm)
    targets: Dict[str, jax.Array],
    k: int,
) -> jax.Array:
    """Per-anchor assembled-mask BCE, box-cropped and area-normalized.

    A static top-k of positive anchors per image keeps shapes fixed (TPU):
    k anchors x (hp, wp) assembled masks is ~k/4 the pixels of one frame —
    cheap next to the backbone. Anchors beyond the positive count carry
    zero weight and vanish from the mean.
    """
    b, a, nm = coeffs.shape
    _, hp, wp, _ = protos.shape
    w = targets["box_w"]                      # (B, A)
    k = min(k, a)
    wk, idx = jax.lax.top_k(w, k)             # (B, k) picks positives first
    sel_c = jnp.take_along_axis(coeffs, idx[..., None], axis=1)   # (B,k,nm)
    sel_i = jnp.clip(
        jnp.take_along_axis(targets["inst_id"], idx, axis=1), 0, None
    )                                                              # (B,k)
    logits = jnp.einsum(
        "bkn,bhwn->bkhw", sel_c, protos,
        preferred_element_type=jnp.float32,
    )
    gt = jnp.take_along_axis(
        targets["inst_mask"], sel_i[:, :, None, None], axis=1
    )                                                              # (B,k,hp,wp)
    boxes = jnp.take_along_axis(
        targets["inst_box"], sel_i[:, :, None], axis=1
    ) / PROTO_STRIDE                                               # (B,k,4)
    ys = jax.lax.broadcasted_iota(jnp.float32, (hp, wp), 0) + 0.5
    xs = jax.lax.broadcasted_iota(jnp.float32, (hp, wp), 1) + 0.5
    x1, y1, x2, y2 = (boxes[..., i][..., None, None] for i in range(4))
    inbox = ((xs >= x1) & (xs < x2) & (ys >= y1) & (ys < y2)).astype(
        jnp.float32
    )
    px = _bce(logits, gt) * inbox                                  # (B,k,hp,wp)
    area = jnp.maximum((x2 - x1) * (y2 - y1), 1.0)[..., 0, 0]      # (B,k)
    per_anchor = px.sum(axis=(-1, -2)) / area                      # (B,k)
    return jnp.sum(per_anchor * wk) / jnp.maximum(jnp.sum(wk), 1.0)
