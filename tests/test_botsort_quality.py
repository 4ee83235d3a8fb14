"""BoT-SORT extension quality, measured (VERDICT r2 weak #3).

Two claims that were previously asserted, now measured:
1. appearance cost fusion reduces ID switches on crowded crossings
   (synthetic embeddings — isolates the fusion logic);
2. the detector-feature pooled embedding (`Pipeline._pooled_embeddings`,
   the zero-cost stand-in for BoT-SORT's external ReID net) is actually
   discriminative on the scene family: same-object embeddings across
   frames are closer than different-object embeddings (needs the trained
   weights artifact; skips without it).
"""

import dataclasses
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rt3d.config import TrackerConfig
from rt3d.tracking import bytetrack_init, bytetrack_step

from tests.test_assignment_modes import (
    D,
    _crossing_scene,
    _detections_from_gt,
    _id_switches,
)

WEIGHTS = os.path.join(os.path.dirname(__file__), "..", "weights",
                       "yolo11n_synth_seg.npz")
EMB = 64


def _run_tracker_emb(with_reid: bool, gts, seed: int, emb_noise=0.15):
    """Crossing scene where every GT object carries a stable appearance
    vector + per-frame noise — the signal BoT-SORT fuses and ByteTrack
    ignores."""
    cfg = TrackerConfig(
        max_tracks=32, tracker_type="botsort", with_reid=with_reid,
        emb_dim=EMB,
    )
    step = jax.jit(
        lambda ts, det, e: bytetrack_step(
            ts, det, cfg, frame_rate=30, det_emb=e)
    )
    ts = bytetrack_init(cfg.max_tracks, emb_dim=EMB)
    rng = np.random.default_rng(seed + 99)
    frames, n, _ = gts.shape
    base = np.linalg.qr(rng.normal(size=(EMB, EMB)))[0][:n]  # orthonormal
    ids_by_object = np.full((frames, n), -1, np.int64)
    for t in range(frames):
        det, perm = _detections_from_gt(gts[t], rng)
        emb = np.zeros((D, EMB), np.float32)
        v = base[perm] + rng.normal(0, emb_noise, (n, EMB))
        emb[:n] = v / np.linalg.norm(v, axis=1, keepdims=True)
        ts, ids = step(ts, det, jnp.asarray(emb))
        ids = np.asarray(ids)
        for slot, obj in enumerate(perm):
            ids_by_object[t, obj] = ids[slot]
    return ids_by_object


def test_appearance_fusion_reduces_id_switches():
    """10-way crossing, heavy 6 px jitter (the regime where pure-IoU
    greedy pays ~90 IDSW, tests/test_assignment_modes.py). Appearance
    fusion must cut switches substantially — that is BoT-SORT's reason to
    exist (`/root/reference/trackers/botsort.yaml:14-19`)."""
    sw_iou, sw_reid = [], []
    for seed in (3, 7):
        gts = _crossing_scene(num_objects=10, frames=40, noise=6.0,
                              seed=seed)
        sw_iou.append(_id_switches(_run_tracker_emb(False, gts, seed)))
        sw_reid.append(_id_switches(_run_tracker_emb(True, gts, seed)))
    print(f"IDSW iou-only={sw_iou} with-reid={sw_reid}")
    assert sum(sw_reid) < 0.6 * sum(sw_iou), (sw_iou, sw_reid)


@pytest.mark.skipif(not os.path.exists(WEIGHTS),
                    reason="trained weights artifact missing")
def test_detector_embedding_is_discriminative():
    """Pooled P3 features of the TRAINED detector on two visually distinct
    synthetic objects: across frames, same-object cosine similarity must
    exceed cross-object similarity by a clear margin."""
    from rt3d.config import reference_2cam_config, with_cameras
    from rt3d.io.synthetic import SyntheticSource
    from rt3d.models.yolo.convert import load_params
    from rt3d.pipeline.step import build_pipeline

    with open(os.path.splitext(WEIGHTS)[0] + ".json") as f:
        manifest = json.load(f)
    cfg = reference_2cam_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, variant=manifest["variant"],
            input_hw=tuple(manifest["input_hw"]), conf_thresh=0.25),
        tracker=dataclasses.replace(
            cfg.tracker, tracker_type="botsort", with_reid=True),
    )
    src = SyntheticSource(num_cameras=2, num_frames=None, hw=(720, 1280),
                          num_objects=2, seed=555)
    cfg = with_cameras(cfg, src.cameras())
    pipe = build_pipeline(cfg)
    params = {k: jnp.asarray(v, jnp.float32)
              for k, v in load_params(WEIGHTS).items()}
    detect = jax.jit(pipe.detect)

    # collect per-object embeddings over frames, keyed by which gt
    # instance each detection's box centre falls in
    per_obj = {0: [], 1: []}
    for frame in (0, 29, 58):
        pkt = src.get(frame)
        centers = src.object_centers(frame)
        images = pipe.preprocess(jnp.asarray(pkt.rgb))
        det, _, emb = detect(params, images)
        assert emb is not None
        boxes = np.asarray(det.boxes)
        valid = np.asarray(det.valid)
        embs = np.asarray(emb)
        gt = src.gt_masks(frame)
        for c in range(2):
            for d in range(boxes.shape[1]):
                if not valid[c, d]:
                    continue
                cx = (boxes[c, d, 0] + boxes[c, d, 2]) / 2
                cy = (boxes[c, d, 1] + boxes[c, d, 3]) / 2
                for k in range(2):
                    m = gt[c, k]
                    if m.sum() < 16:
                        continue
                    ys, xs = np.nonzero(m)
                    if (xs.min() <= cx <= xs.max()
                            and ys.min() <= cy <= ys.max()):
                        per_obj[k].append(embs[c, d])
    assert len(per_obj[0]) >= 3 and len(per_obj[1]) >= 3

    def cos(a, b):
        return float(np.dot(a, b)
                     / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-9))

    intra, inter = [], []
    for k in (0, 1):
        v = per_obj[k]
        intra += [cos(v[i], v[j]) for i in range(len(v))
                  for j in range(i + 1, len(v))]
    inter += [cos(a, b) for a in per_obj[0] for b in per_obj[1]]
    mi, me = float(np.mean(intra)), float(np.mean(inter))
    print(f"embedding cosine: intra={mi:.3f} inter={me:.3f}")
    assert mi > me + 0.1, (mi, me)
