"""BoT-SORT appearance fusion: measured ID-quality delta vs plain ByteTrack.

VERDICT r2 #6: the ReID extension passed unit tests but its discriminative
power was asserted, not measured. This file quantifies it on the crossing
scenes from tests/test_assignment_modes.py — the hardest association case
(every trajectory pair crosses mid-sequence) — by giving each GT object a
persistent appearance embedding, exactly what `Pipeline._pooled_embeddings`
extracts from the detector's stride-8 neck features on real frames.

Reference behavior: `/root/reference/trackers/botsort.yaml:14-19` enables
`with_reid` with `appearance_thresh: 0.25`; ultralytics fuses IoU and
embedding cost in the first association. Our fusion is
`rt3d/tracking/botsort.py:botsort_fuse_costs`.

The device COST of the extensions at HD720 is measured separately by
`RT3D_BENCH_TRACKER=botsort python bench.py` (recorded in NOTES.md).
"""

import dataclasses

import numpy as np
import jax
import pytest

from rt3d.config import TrackerConfig
from rt3d.tracking import bytetrack_init, bytetrack_step

from tests.test_assignment_modes import (
    D,
    _crossing_scene,
    _detections_from_gt,
    _id_switches,
)


def _object_embeddings(num_objects: int, emb_dim: int, seed: int):
    """One persistent unit appearance vector per GT object. Random unit
    vectors in 64-dim are near-orthogonal (cosine distance ~1), which is
    the same regime as pooled neck features for visually distinct objects;
    per-frame noise models pose/lighting wobble."""
    rng = np.random.default_rng(seed)
    e = rng.normal(size=(num_objects, emb_dim)).astype(np.float32)
    return e / np.linalg.norm(e, axis=-1, keepdims=True)


def _run_tracker(gts, with_reid: bool, seed: int, emb_noise: float = 0.15,
                 tracker: str | None = None):
    tracker = tracker or ("botsort" if with_reid else "bytetrack")
    if tracker == "deepsort":
        # appearance-primary association (rt3d/tracking/deepsort.py).
        # max_cosine_distance is opened up from DeepSORT's 0.2 release
        # default (tuned for its trained ReID net) to admit this noise
        # model: emb_noise 0.15/dim over 64 dims puts same-object cosine
        # distance around 0.35, cross-object around 1.0.
        from rt3d.tracking.deepsort import deepsort_step

        cfg = TrackerConfig(max_tracks=32, tracker_type="deepsort",
                            with_reid=True, max_cosine_distance=0.6)
        step = jax.jit(
            lambda ts, det, emb: deepsort_step(
                ts, det, cfg, frame_rate=30, det_emb=emb)
        )
    else:
        cfg = TrackerConfig(max_tracks=32, with_reid=with_reid,
                            tracker_type=tracker)
        step = jax.jit(
            lambda ts, det, emb: bytetrack_step(
                ts, det, cfg, frame_rate=30,
                det_emb=emb if with_reid else None)
        )
    ts = bytetrack_init(cfg.max_tracks, emb_dim=cfg.emb_dim)
    rng = np.random.default_rng(seed + 99)
    frames, n, _ = gts.shape
    obj_emb = _object_embeddings(n, cfg.emb_dim, seed)
    ids_by_object = np.full((frames, n), -1, np.int64)
    for t in range(frames):
        det, perm = _detections_from_gt(gts[t], rng)
        emb = np.zeros((D, cfg.emb_dim), np.float32)
        emb[: len(perm)] = obj_emb[perm]
        emb += rng.normal(0, emb_noise, emb.shape).astype(np.float32)
        emb /= np.maximum(np.linalg.norm(emb, axis=-1, keepdims=True), 1e-6)
        ts, ids = step(ts, det, jax.numpy.asarray(emb))
        ids = np.asarray(ids)
        for slot, obj in enumerate(perm):
            ids_by_object[t, obj] = ids[slot]
    return ids_by_object


@pytest.mark.parametrize("noise", [1.0, 6.0])
def test_reid_reduces_id_switches_on_crossings(noise):
    """10 objects through a 10-way crossing, 40 frames, detection jitter
    `noise` px, greedy assignment both sides. Appearance fusion should
    never hurt, and under heavy jitter it should recover a large fraction
    of the switches motion-only association pays.

    Measured (seeds 3/4/5 summed, this scenario, greedy):

      noise px | plain ByteTrack | +ReID fusion
      ---------|-----------------|-------------
          1    |        0        |      0
          6    |       ~266      |    ~144  (-46%)
    """
    totals = {"plain": 0, "reid": 0, "deepsort": 0}
    for seed in (3, 4, 5):
        gts = _crossing_scene(num_objects=10, frames=40, noise=noise,
                              seed=seed)
        totals["plain"] += _id_switches(_run_tracker(gts, False, seed))
        totals["reid"] += _id_switches(_run_tracker(gts, True, seed))
        totals["deepsort"] += _id_switches(
            _run_tracker(gts, True, seed, tracker="deepsort"))
    print(f"noise={noise}: IDSW plain={totals['plain']} "
          f"reid={totals['reid']} deepsort={totals['deepsort']}")
    if noise <= 1.0:
        assert totals["plain"] == totals["reid"] == 0
        assert totals["deepsort"] == 0
    else:
        # the envelope below is calibrated from the measured table above;
        # the strict claim is the direction and a real (>=25%) reduction
        assert totals["reid"] <= totals["plain"] * 0.75, totals
        assert totals["reid"] > 0  # crossings at 6 px are not free
        # appearance-PRIMARY association must beat motion-only too
        assert totals["deepsort"] <= totals["plain"] * 0.75, totals


def test_reid_rescues_identical_motion_swap():
    """Two objects meet head-on with identical speed on the same line —
    motion cost is perfectly symmetric at the meeting point, so plain
    association resolves the swap by slot order (a coin flip under the
    per-frame detection shuffle), while near-orthogonal appearance
    embeddings make it unambiguous. This is the canonical BoT-SORT
    motivating case (two players crossing)."""
    frames = 31
    gt = np.zeros((frames, 2, 4), np.float32)
    for t in range(frames):
        a = t / (frames - 1)
        cx = np.array([100 + 440 * a, 540 - 440 * a], np.float32)
        cy = np.array([240.0, 240.0], np.float32)
        gt[t, :, 0] = cx - 30
        gt[t, :, 1] = cy - 30
        gt[t, :, 2] = cx + 30
        gt[t, :, 3] = cy + 30
    swaps_plain = swaps_reid = swaps_deep = 0
    for seed in range(6):
        ids_p = _run_tracker(gt, False, seed, emb_noise=0.1)
        ids_r = _run_tracker(gt, True, seed, emb_noise=0.1)
        ids_d = _run_tracker(gt, True, seed, emb_noise=0.1,
                             tracker="deepsort")
        # a swap = both objects end the sequence wearing the other's
        # starting id (ids swapped relative to frame 0)
        def swapped(ids):
            return bool(ids[-1, 0] == ids[0, 1] and ids[-1, 1] == ids[0, 0]
                        and ids[0, 0] != ids[0, 1])
        swaps_plain += swapped(ids_p)
        swaps_reid += swapped(ids_r)
        swaps_deep += swapped(ids_d)
    print(f"head-on swaps: plain={swaps_plain}/6 reid={swaps_reid}/6 "
          f"deepsort={swaps_deep}/6")
    # appearance must resolve every head-on meeting; motion-only is
    # allowed any behavior (it's genuinely ambiguous)
    assert swaps_reid == 0, swaps_reid
    assert swaps_deep == 0, swaps_deep
