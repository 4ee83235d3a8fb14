"""Detection-loop evaluation: the pipeline's OWN detections vs the
analytic scene truth.

Shared by `tools/train_synth.py` (post-training eval) and
`tests/test_detection_loop.py` (golden assertions on the checked-in
weights artifact): runs `Pipeline.detect` + `Pipeline.masks` — the exact
inference path of `Pipeline.step` — and scores predicted instance masks
against `SyntheticSource.gt_masks`.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np


def mask_iou(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return float(inter) / float(max(union, 1))


def evaluate_weights(
    params,
    variant: str = "n",
    hw=(720, 1280),
    input_hw=(384, 640),
    num_frames: int = 6,
    seed: int = 777,
    conf_thresh: float = 0.25,
    pipe=None,
) -> Dict[str, float]:
    """Returns {recall, mean_iou, mean_dets, frames}.

    recall: fraction of ground-truth instances matched by a prediction of
    the right class with mask IoU >= 0.5. mean_iou: mean best-IoU over all
    gt instances (unmatched count as 0).
    """
    import jax
    import jax.numpy as jnp

    from rt3d.config import reference_2cam_config, with_cameras
    from rt3d.io.synthetic import SyntheticSource
    from rt3d.pipeline.step import build_pipeline
    from rt3d.train.data import SYNTH_CLASSES

    rng = np.random.default_rng(seed)
    ious, matched, total_gt, ndets = [], 0, 0, []
    if pipe is None:
        cfg = reference_2cam_config()
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model, variant=variant, input_hw=tuple(input_hw),
                conf_thresh=conf_thresh,
            ),
        )
        src0 = SyntheticSource(num_cameras=2, num_frames=None, hw=hw,
                               num_objects=1, seed=int(seed))
        cfg = with_cameras(cfg, src0.cameras())
        pipe = build_pipeline(cfg)
    detect = jax.jit(pipe.detect)
    masks_fn = jax.jit(pipe.masks)

    for f in range(num_frames):
        n_obj = int(rng.integers(1, 4))
        src = SyntheticSource(num_cameras=2, num_frames=None, hw=hw,
                              num_objects=n_obj, seed=int(seed) + f)
        idx = int(rng.integers(0, 3000))
        pkt = src.get(idx)
        gt = src.gt_masks(idx)  # (C, N, H, W)
        images = pipe.preprocess(jnp.asarray(pkt.rgb))
        det, protos, _ = detect(params, images)
        pred_masks = np.asarray(masks_fn(protos, det))  # (C, D, H, W)
        det_valid = np.asarray(det.valid)
        det_cls = np.asarray(det.classes)
        ndets.append(int(det_valid.sum()))
        for c in range(2):
            for k in range(n_obj):
                gt_cls = SYNTH_CLASSES[k % len(SYNTH_CLASSES)]
                g = gt[c, k]
                if g.sum() < 16:
                    continue  # out of frame
                total_gt += 1
                best = 0.0
                for d in range(pred_masks.shape[1]):
                    if not det_valid[c, d] or det_cls[c, d] != gt_cls:
                        continue
                    best = max(best, mask_iou(g, pred_masks[c, d]))
                ious.append(best)
                if best >= 0.5:
                    matched += 1

    return {
        "recall": matched / max(total_gt, 1),
        "mean_iou": float(np.mean(ious)) if ious else 0.0,
        "mean_dets": float(np.mean(ndets)) if ndets else 0.0,
        "gt_instances": total_gt,
        "frames": num_frames,
    }
