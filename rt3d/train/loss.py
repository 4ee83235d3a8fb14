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


def seg_detection_loss(
    model: YoloSeg,
    params,
    images: jax.Array,        # (B, H, W, 3)
    targets: Dict[str, jax.Array],
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """targets:
    cls:    (B, A, nc)  {0,1} per-anchor class labels
    box:    (B, A, 4)   ltrb distances in stride units, clipped to REG_MAX-1
    box_w:  (B, A)      anchor assignment weights (0 = background)
    mask:   (B, hp, wp) {0,1} target foreground map (prototype supervision)
    """
    box_logits, cls_logits, _coeffs, protos = model.forward(params, images)
    b, a, _ = cls_logits.shape

    # classification: sigmoid BCE over all anchors
    cls_t = targets["cls"]
    bce = jnp.mean(
        jnp.maximum(cls_logits, 0) - cls_logits * cls_t
        + jnp.log1p(jnp.exp(-jnp.abs(cls_logits)))
    )

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

    # prototype supervision: BCE of the first prototype channel vs target map
    proto_logit = protos[..., 0]
    m = targets["mask"]
    proto_loss = jnp.mean(
        jnp.maximum(proto_logit, 0) - proto_logit * m
        + jnp.log1p(jnp.exp(-jnp.abs(proto_logit)))
    )

    loss = bce + box_loss + 0.5 * proto_loss
    return loss, {"cls": bce, "box": box_loss, "proto": proto_loss}
