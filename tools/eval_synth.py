"""Detection-loop evaluation: the pipeline's OWN detections vs the
analytic scene truth.

Shared by `tools/train_synth.py` (post-training eval) and
`tests/test_detection_loop.py` (golden assertions on the checked-in
weights artifact): runs `Pipeline.detect` + `Pipeline.masks` — the exact
inference path of `Pipeline.step` — and scores predicted instance masks
against `SyntheticSource.gt_masks`.

Metrics (per the reference's operating point — conf/NMS filtering at
`/root/reference/2cam/2cams_mask_gpu.py:274,283` is what keeps its
downstream object path phantom-free):

* ``recall`` / ``mean_iou``: over TARGET instances with >= `min_visible_px`
  visible pixels, fraction matched by a same-class prediction with mask
  IoU >= 0.5, and the mean best-IoU.
* ``precision`` = TP / (TP + FP) over ALL predictions, matched one-to-one
  (score order) against ALL ground-truth instances — targets AND
  distractors, so a correct `book` detection is a true positive while a
  `bottle` fired on a book is not.  FPs are characterized:
    - ``fp_dup``: same-class IoU >= 0.5 with an already-claimed instance
      (double detections surviving class-aware NMS);
    - ``fp_misclass``: IoU >= 0.5 with an instance of another class;
    - ``fp_ghost``: no ground-truth overlap at all (phantoms that would
      become phantom object clouds downstream).
* ``fp_per_frame``: (fp_dup + fp_misclass + fp_ghost) / frames — the rate
  at which phantom candidates enter masks->clouds->fusion.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import numpy as np


def mask_iou(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return float(inter) / float(max(union, 1))


def match_frame(
    gt_masks: np.ndarray,     # (M, H, W) bool — ALL instances, one camera
    gt_classes: np.ndarray,   # (M,) int
    pred_masks: np.ndarray,   # (D, H, W) bool, score-ordered
    pred_valid: np.ndarray,   # (D,) bool
    pred_classes: np.ndarray,  # (D,) int
    iou_thresh: float = 0.5,
) -> Dict[str, int]:
    """One-to-one greedy matching in score order. Returns TP/FP counts."""
    claimed = np.zeros(len(gt_masks), bool)
    tp = dup = misclass = ghost = 0
    for d in range(len(pred_masks)):
        if not pred_valid[d]:
            continue
        ious = np.array([mask_iou(g, pred_masks[d]) for g in gt_masks]) \
            if len(gt_masks) else np.zeros((0,))
        same = ious * (gt_classes == pred_classes[d])
        if len(same) and same.max() >= iou_thresh:
            k = int(np.argmax(same))
            if claimed[k]:
                dup += 1
            else:
                claimed[k] = True
                tp += 1
        elif len(ious) and ious.max() >= iou_thresh:
            misclass += 1
        else:
            ghost += 1
    return {"tp": tp, "fp_dup": dup, "fp_misclass": misclass,
            "fp_ghost": ghost}


def evaluate_weights(
    params,
    variant: str = "n",
    hw=(720, 1280),
    input_hw=(384, 640),
    num_frames: int = 6,
    seed: int = 777,
    conf_thresh: float = 0.25,
    pipe=None,
    domain: str = "easy",
    min_visible_px: int = 64,
    max_objects: int = 3,
) -> Dict[str, float]:
    """Returns recall / mean_iou / precision / FP breakdown (docstring
    above). Each frame is a fresh seeded scene (held out from training by
    seed), `1..max_objects` targets; hard scenes add their own distractors.
    """
    import jax
    import jax.numpy as jnp

    from rt3d.config import reference_2cam_config, with_cameras
    from rt3d.io.synthetic import SyntheticSource
    from rt3d.pipeline.step import build_pipeline

    rng = np.random.default_rng(seed)
    # post-hoc score thresholds: filtering NMS survivors by score >= t is
    # EXACTLY the detection set of running NMS with conf_thresh=t
    # (suppression flows strictly from higher to lower scores), so one
    # pass yields the whole operating curve without re-jitting.
    sweep = [t for t in (0.25, 0.4, 0.6, 0.8) if t >= conf_thresh]
    ious = []
    matched = {t: 0 for t in sweep}
    total_gt = gt_small = 0
    counts = {t: {"tp": 0, "fp_dup": 0, "fp_misclass": 0, "fp_ghost": 0}
              for t in sweep}
    ndets = []
    base_pipe = pipe
    for f in range(num_frames):
        n_obj = int(rng.integers(1, max_objects + 1))
        src = SyntheticSource(num_cameras=2, num_frames=None, hw=hw,
                              num_objects=n_obj, seed=int(seed) + f,
                              domain=domain)
        if base_pipe is None and f == 0:
            cfg = reference_2cam_config()
            cfg = dataclasses.replace(
                cfg,
                model=dataclasses.replace(
                    cfg.model, variant=variant, input_hw=tuple(input_hw),
                    conf_thresh=conf_thresh,
                ),
            )
            cfg = with_cameras(cfg, src.cameras())
            pipe = build_pipeline(cfg)
        if f == 0:
            detect = jax.jit(pipe.detect)
            masks_fn = jax.jit(pipe.masks)
        idx = int(rng.integers(0, 3000))
        pkt = src.get(idx)
        gt_all = src.gt_masks_all(idx)     # (C, M, H, W)
        cls_all = src.all_classes          # (M,)
        images = pipe.preprocess(jnp.asarray(pkt.rgb))
        det, protos, _ = detect(params, images)
        pred_masks = np.asarray(masks_fn(protos, det))  # (C, D, H, W)
        det_valid = np.asarray(det.valid)
        det_cls = np.asarray(det.classes)
        det_scores = np.asarray(det.scores)
        ndets.append(int(det_valid.sum()))
        for c in range(2):
            for t in sweep:
                fm = match_frame(gt_all[c], cls_all, pred_masks[c],
                                 det_valid[c] & (det_scores[c] >= t),
                                 det_cls[c])
                for k in counts[t]:
                    counts[t][k] += fm[k]
            for k in range(n_obj):   # recall over targets only
                g = gt_all[c, k]
                npx = g.sum()
                if npx < min_visible_px:
                    gt_small += int(npx >= 16)
                    continue
                total_gt += 1
                best = {t: 0.0 for t in sweep}
                for d in range(pred_masks.shape[1]):
                    if not det_valid[c, d] or det_cls[c, d] != cls_all[k]:
                        continue
                    iou = mask_iou(g, pred_masks[c, d])
                    for t in sweep:
                        if det_scores[c, d] >= t:
                            best[t] = max(best[t], iou)
                ious.append(best[sweep[0]])
                for t in sweep:
                    if best[t] >= 0.5:
                        matched[t] += 1

    def row(t):
        cc = counts[t]
        n_fp = cc["fp_dup"] + cc["fp_misclass"] + cc["fp_ghost"]
        n_pred = cc["tp"] + n_fp
        return {
            "recall": matched[t] / max(total_gt, 1),
            "precision": cc["tp"] / max(n_pred, 1),
            "fp_per_frame": n_fp / max(num_frames, 1),
            "dup_rate": cc["fp_dup"] / max(n_pred, 1),
            **cc,
        }

    out = {
        **row(sweep[0]),
        "mean_iou": float(np.mean(ious)) if ious else 0.0,
        "mean_dets": float(np.mean(ndets)) if ndets else 0.0,
        "gt_instances": total_gt,
        "gt_below_min_visible": gt_small,
        "min_visible_px": min_visible_px,
        "conf_thresh": conf_thresh,
        "domain": domain,
        "frames": num_frames,
        # the full operating curve (exact — see sweep note above)
        "by_conf": {f"{t:g}": row(t) for t in sweep[1:]},
    }
    return out
