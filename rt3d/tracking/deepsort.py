"""DeepSORT: appearance-embedding association over the fixed-slot state.

BASELINE configs[3] ("DeepSORT appearance-embedding tracking") — the
classic Wojke et al. tracker the reference's ultralytics stack offers as
the ancestor of its BoT-SORT option. Association differs from
ByteTrack/BoT-SORT in kind, not just cost shape:

* the PRIMARY metric is appearance — cosine distance between per-track
  smoothed embeddings and detection embeddings — with motion entering
  only as a chi-square GATE (squared Mahalanobis distance of the
  detection to the track's predicted measurement distribution), plus an
  optional blended motion term (the paper's lambda, 0 in the release);
* a single confidence threshold (no BYTE low-score second round);
* unconfirmed tracks and just-lost tracks fall back to IoU matching
  (DeepSORT's `min_cost_matching(iou_matching.iou_cost)` stage).

Divergences (documented, deliberate):

* fixed track slots + padded detections (TPU static shapes), like the
  other trackers here;
* the matching CASCADE (strict age-bucketed priority) is replaced by one
  global assignment with an age-penalized cost. StrongSORT (Du et al.,
  2023) measured the cascade as HARMFUL once the metric is strong and
  replaced it with exactly this global solve; the penalty term keeps the
  cascade's tie-breaking preference for recently-seen tracks;
* embeddings come from the detector's own neck features
  (`pipeline.step._pooled_embeddings`) instead of an external ReID CNN —
  same divergence as our BoT-SORT, zero extra conv cost.

Life cycle (predict / spawn / expire) is shared with ByteTrack
(`bytetrack._predict_tracks/_spawn_new_tracks/_expire_lost`): DeepSORT's
n_init-hit confirmation and max_age expiry map onto the same slot state
machine (`activated` two-hit, `track_buffer` aging).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from rt3d.config import TrackerConfig
from rt3d.models.yolo.postprocess import Detections, box_iou_matrix
from rt3d.tracking.assignment import solve_matching
from rt3d.tracking.botsort import embedding_distance, update_smooth_features
from rt3d.tracking.bytetrack import (
    EMPTY,
    LOST,
    TRACKED,
    TrackerState,
    _apply_matches,
    _expire_lost,
    _predict_tracks,
    _spawn_new_tracks,
    xyah_to_xyxy,
    xyxy_to_xyah,
)
from rt3d.tracking.kalman import gating_distance

# chi-square 0.95 inverse CDF — DeepSORT's kalman_filter.chi2inv95
GATE_2DOF = 5.9915  # (x, y) position-only gating (DeepSORT default)
GATE_4DOF = 9.4877  # full xyah gating

_INF_COST = 1e6


def deepsort_cost(
    ts: TrackerState,
    det_xyah: jax.Array,   # (D, 4)
    det_emb: jax.Array,    # (D, E) L2-normalized
    cfg: TrackerConfig,
) -> jax.Array:
    """(S, D) association cost: appearance cosine distance, chi-square
    Mahalanobis gate, optional motion blend, age penalty.

    cost = (1-λ)·d_app + λ·(d_maha / gate), ∞ where d_maha > gate or
    d_app > max_cosine_distance; + ε·frames_since_update (cascade analog).
    """
    app = embedding_distance(ts.emb, det_emb)  # (S, D)
    maha = gating_distance(
        ts.mean, ts.cov, det_xyah,
        only_position=cfg.gate_only_position,
    )
    gate = GATE_2DOF if cfg.gate_only_position else GATE_4DOF
    lam = cfg.motion_lambda
    cost = (1.0 - lam) * app + lam * (maha / gate)
    cost = jnp.where(maha > gate, _INF_COST, cost)
    cost = jnp.where(app > cfg.max_cosine_distance, _INF_COST, cost)
    # cascade analog: between near-equal costs, prefer the track seen most
    # recently (ε per missed frame; ε << any real appearance difference)
    age = (ts.frame_id - ts.last_update).astype(jnp.float32)
    return cost + 1e-3 * age[:, None]


def deepsort_step(
    ts: TrackerState,
    det: Detections,
    cfg: TrackerConfig,
    frame_rate: int = 30,
    det_emb: jax.Array | None = None,
    gmc_warp: jax.Array | None = None,
) -> Tuple[TrackerState, jax.Array]:
    """Advance the DeepSORT tracker one frame; same contract as
    `bytetrack_step` (returns det_track_ids (D,), -1 for unmatched /
    unconfirmed). `det_emb` is required — DeepSORT without appearance
    features is just IoU-SORT; `build_pipeline` enforces `with_reid`."""
    assert det_emb is not None, "deepsort requires detection embeddings"
    s = ts.mean.shape[0]
    d = det.capacity
    frame_id = ts.frame_id + 1
    ts = ts.replace(frame_id=frame_id)

    conf = det.valid & (det.scores >= cfg.track_high_thresh)
    det_xyah = xyxy_to_xyah(det.boxes)

    ts = _predict_tracks(ts, gmc_warp)

    was_tracked = ts.state == TRACKED
    confirmed = (was_tracked & ts.activated) | (ts.state == LOST)
    unconfirmed = was_tracked & ~ts.activated

    method = getattr(cfg, "assignment", "greedy")

    # --- round 1: confirmed tracks x confident dets, appearance metric
    cost1 = deepsort_cost(ts, det_xyah, det_emb, cfg)
    cost1 = jnp.where(confirmed[:, None] & conf[None, :], cost1, _INF_COST)
    # the gate IS the threshold: anything not infinite is acceptable
    _, r1_row_of_col = solve_matching(cost1, _INF_COST * 0.5, method=method)
    r1_matched_slot = jnp.zeros((s,), bool).at[
        jnp.where(r1_row_of_col >= 0, r1_row_of_col, s)
    ].set(True, mode="drop")
    ts = _apply_matches(ts, r1_row_of_col, det_xyah, det.scores, det.classes)

    # --- round 2: IoU fallback — unconfirmed tracks and tracks missed for
    # exactly one frame (DeepSORT's iou_matching stage over unconfirmed +
    # time_since_update==1), vs dets the appearance round left unmatched
    recent_miss = (
        confirmed & ~r1_matched_slot & (frame_id - ts.last_update == 1)
    )
    r2_rows = unconfirmed | recent_miss
    det_taken = r1_row_of_col >= 0
    rem = conf & ~det_taken
    track_boxes = xyah_to_xyxy(ts.mean[:, :4])
    iou_cost = 1.0 - box_iou_matrix(track_boxes, det.boxes)
    iou_cost = jnp.where(r2_rows[:, None] & rem[None, :], iou_cost, _INF_COST)
    # max_iou_distance 0.7 (DeepSORT default; == our match_thresh)
    _, r2_row_of_col = solve_matching(iou_cost, cfg.match_thresh,
                                      method=method)
    r2_matched_slot = jnp.zeros((s,), bool).at[
        jnp.where(r2_row_of_col >= 0, r2_row_of_col, s)
    ].set(True, mode="drop")
    ts = _apply_matches(ts, r2_row_of_col, det_xyah, det.scores, det.classes)

    # unmatched confirmed -> lost; unmatched unconfirmed -> removed
    # (DeepSORT: mark_missed — tentative tracks delete on first miss)
    miss = confirmed & ~r1_matched_slot & ~r2_matched_slot
    ts = ts.replace(state=jnp.where(miss & was_tracked, LOST, ts.state))
    ts = ts.replace(
        state=jnp.where(unconfirmed & ~r2_matched_slot, EMPTY, ts.state)
    )

    # --- new tracks from leftover confident dets
    det_taken = det_taken | (r2_row_of_col >= 0)
    is_new = conf & ~det_taken & (det.scores > cfg.new_track_thresh)
    ts, placeable, scatter_slot, ids_for_new = _spawn_new_tracks(
        ts, is_new, det_xyah, det.scores, det.classes, frame_id
    )
    cols = jnp.arange(d, dtype=jnp.int32)

    # --- appearance EMA (DeepSORT keeps a feature GALLERY per track; the
    # EMA smoothing is StrongSORT's refinement of it — same memory budget
    # as our BoT-SORT state, measured equally discriminative there)
    slot_det = jnp.full((s,), -1, jnp.int32)
    for roc in (r1_row_of_col, r2_row_of_col):
        slot_det = slot_det.at[
            jnp.where(roc >= 0, roc, s)
        ].set(cols, mode="drop")
    fresh = jnp.zeros((s,), bool).at[scatter_slot].set(True, mode="drop")
    slot_det_new = slot_det.at[scatter_slot].set(cols, mode="drop")
    ts = ts.replace(emb=update_smooth_features(
        ts.emb, det_emb, slot_det_new, fresh
    ))

    ts = _expire_lost(ts, frame_id, cfg, frame_rate)

    # --- per-detection ids (activated slots only)
    def ids_from(row_of_col):
        slot = jnp.clip(row_of_col, 0, s - 1)
        ok = (row_of_col >= 0) & ts.activated[slot]
        return jnp.where(ok, ts.track_id[slot], -1)

    det_ids = jnp.maximum(ids_from(r1_row_of_col), ids_from(r2_row_of_col))
    new_ids = jnp.where(placeable & (frame_id == 1), ids_for_new, -1)
    return ts, jnp.maximum(det_ids, new_ids).astype(jnp.int32)
