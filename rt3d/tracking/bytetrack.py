"""ByteTrack as a jitted step over a fixed-slot `TrackerState` pytree.

Faithful port of the BYTETracker life cycle the reference configures through
`trackers/bytetrack.yaml` (high 0.6 / low 0.05 / new 0.5 / buffer 1500 /
match 0.7) and drives via `model.track(persist=True)`
(`2cam/vision_pipeline_utils.py:258-277`):

  round 1: {activated tracked + lost} x {high-score dets},
           cost = fused IoU (1 - iou*score), gate `match_thresh`;
  round 2: {still-tracked leftovers} x {low-score dets},
           cost = 1 - iou, gate 0.5 (BYTETracker hardcodes it);
  round 3: {unconfirmed tracks} x {leftover high dets}, fused IoU, gate 0.7;
  then: unmatched tracked -> lost; unmatched unconfirmed -> removed;
  leftover high dets above `new_track_thresh` -> new tracks (activated
  immediately only on frame 1); lost tracks older than the buffer -> removed.

Differences from ultralytics are representational, not semantic: track
state lives in a fixed-capacity pytree (TPU static shapes) instead of
Python lists, and the `lapx` solve is `rt3d.tracking.assignment.hungarian`.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from rt3d.config import TrackerConfig
from rt3d.models.yolo.postprocess import Detections, box_iou_matrix
from rt3d.tracking.assignment import solve_matching
from rt3d.tracking.kalman import (
    kalman_initiate,
    kalman_predict,
    kalman_update,
    xyah_to_xyxy,
    xyxy_to_xyah,
)

# slot states
EMPTY = 0
TRACKED = 1
LOST = 2


@struct.dataclass
class TrackerState:
    mean: jax.Array       # (S, 8) Kalman mean
    cov: jax.Array        # (S, 8, 8) Kalman covariance
    score: jax.Array      # (S,) last matched detection score
    cls: jax.Array        # (S,) int32 class id
    track_id: jax.Array   # (S,) int32 persistent id
    state: jax.Array      # (S,) int32 {EMPTY, TRACKED, LOST}
    activated: jax.Array  # (S,) bool (two-hit confirmation)
    last_update: jax.Array  # (S,) int32 frame of last measurement
    emb: jax.Array        # (S, E) smoothed appearance features (BoT-SORT)
    frame_id: jax.Array   # () int32
    next_id: jax.Array    # () int32


def bytetrack_init(max_tracks: int, emb_dim: int = 64) -> TrackerState:
    s = max_tracks
    return TrackerState(
        mean=jnp.zeros((s, 8), jnp.float32),
        cov=jnp.zeros((s, 8, 8), jnp.float32),
        score=jnp.zeros((s,), jnp.float32),
        cls=jnp.full((s,), -1, jnp.int32),
        track_id=jnp.full((s,), -1, jnp.int32),
        state=jnp.zeros((s,), jnp.int32),
        activated=jnp.zeros((s,), bool),
        last_update=jnp.zeros((s,), jnp.int32),
        emb=jnp.zeros((s, emb_dim), jnp.float32),
        frame_id=jnp.int32(0),
        next_id=jnp.int32(1),
    )


def _assoc_round(
    ts: TrackerState,
    det_boxes: jax.Array,
    det_scores: jax.Array,
    row_mask: jax.Array,
    col_mask: jax.Array,
    thresh: float,
    fuse_score: bool,
    method: str = "greedy",
    det_emb=None,
    cfg=None,
) -> Tuple[jax.Array, jax.Array]:
    """One association round. Returns (col_of_row (S,), row_of_col (D,))."""
    track_boxes = xyah_to_xyxy(ts.mean[:, :4])
    iou = box_iou_matrix(track_boxes, det_boxes)
    cost = 1.0 - iou
    if fuse_score:
        cost = 1.0 - (1.0 - cost) * det_scores[None, :]
    if det_emb is not None and cfg is not None:
        from rt3d.tracking.botsort import botsort_fuse_costs, embedding_distance

        cost = botsort_fuse_costs(
            cost, embedding_distance(ts.emb, det_emb),
            cfg.proximity_thresh, cfg.appearance_thresh,
        )
    cost = jnp.where(row_mask[:, None] & col_mask[None, :], cost, 1e6)
    return solve_matching(cost, thresh, method=method)


def _apply_matches(
    ts: TrackerState,
    row_of_col: jax.Array,
    det_xyah: jax.Array,
    det_scores: jax.Array,
    det_cls: jax.Array,
) -> TrackerState:
    """Kalman-update every matched slot with its detection; mark tracked."""
    s = ts.mean.shape[0]
    slot_det = jnp.full((s,), -1, jnp.int32)
    cols = jnp.arange(row_of_col.shape[0], dtype=jnp.int32)
    slot_det = slot_det.at[jnp.where(row_of_col >= 0, row_of_col, s)].set(
        cols, mode="drop"
    )
    matched = slot_det >= 0
    di = jnp.clip(slot_det, 0, det_xyah.shape[0] - 1)
    new_mean, new_cov = kalman_update(ts.mean, ts.cov, det_xyah[di])
    return ts.replace(
        mean=jnp.where(matched[:, None], new_mean, ts.mean),
        cov=jnp.where(matched[:, None, None], new_cov, ts.cov),
        score=jnp.where(matched, det_scores[di], ts.score),
        cls=jnp.where(matched, det_cls[di], ts.cls),
        state=jnp.where(matched, TRACKED, ts.state),
        activated=ts.activated | matched,
        last_update=jnp.where(matched, ts.frame_id, ts.last_update),
    )


def _predict_tracks(
    ts: TrackerState, gmc_warp: jax.Array | None
) -> TrackerState:
    """Kalman-predict every live slot (lost tracks get vh zeroed,
    STrack.predict), then optionally warp by the camera-motion estimate."""
    live = ts.state > EMPTY
    mean_in = ts.mean.at[:, 7].set(
        jnp.where(ts.state == TRACKED, ts.mean[:, 7], 0.0)
    )
    pmean, pcov = kalman_predict(mean_in, ts.cov)
    if gmc_warp is not None:
        from rt3d.tracking.botsort import apply_gmc_to_tracks

        pmean, pcov = apply_gmc_to_tracks(pmean, gmc_warp, pcov)
    return ts.replace(
        mean=jnp.where(live[:, None], pmean, ts.mean),
        cov=jnp.where(live[:, None, None], pcov, ts.cov),
    )


def _spawn_new_tracks(
    ts: TrackerState,
    is_new: jax.Array,       # (D,) bool: detections that start a track
    det_xyah: jax.Array,
    det_scores: jax.Array,
    det_cls: jax.Array,
    frame_id: jax.Array,
) -> Tuple[TrackerState, jax.Array, jax.Array, jax.Array]:
    """Place each flagged detection in an empty slot (k-th new det ->
    k-th empty slot, stable order both sides). Returns
    (state, placeable (D,), scatter_slot (D,), ids_for_new (D,)). Shared
    by ByteTrack and DeepSORT — the life cycle is identical."""
    s = ts.mean.shape[0]
    empty_slots = ts.state == EMPTY
    slot_order = jnp.argsort(jnp.where(empty_slots, 0, 1), stable=True)
    det_rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    n_empty = jnp.sum(empty_slots.astype(jnp.int32))
    placeable = is_new & (det_rank < n_empty)
    target_slot = slot_order[jnp.clip(det_rank, 0, s - 1)]

    new_mean, new_cov = kalman_initiate(det_xyah)
    scatter_slot = jnp.where(placeable, target_slot, s)
    ids_for_new = ts.next_id + det_rank.astype(jnp.int32)

    ts = ts.replace(
        mean=ts.mean.at[scatter_slot].set(new_mean, mode="drop"),
        cov=ts.cov.at[scatter_slot].set(new_cov, mode="drop"),
        score=ts.score.at[scatter_slot].set(det_scores, mode="drop"),
        cls=ts.cls.at[scatter_slot].set(det_cls, mode="drop"),
        track_id=ts.track_id.at[scatter_slot].set(ids_for_new, mode="drop"),
        state=ts.state.at[scatter_slot].set(TRACKED, mode="drop"),
        activated=ts.activated.at[scatter_slot].set(frame_id == 1, mode="drop"),
        last_update=ts.last_update.at[scatter_slot].set(frame_id, mode="drop"),
        next_id=ts.next_id + jnp.sum(placeable.astype(jnp.int32)),
    )
    return ts, placeable, scatter_slot, ids_for_new


def _expire_lost(
    ts: TrackerState, frame_id: jax.Array, cfg: TrackerConfig, frame_rate: int
) -> TrackerState:
    """Free lost slots older than the buffer (max_time_lost =
    frame_rate/30 * track_buffer)."""
    max_lost = jnp.int32(int(frame_rate / 30.0 * cfg.track_buffer))
    expired = (ts.state == LOST) & (frame_id - ts.last_update > max_lost)
    return ts.replace(
        state=jnp.where(expired, EMPTY, ts.state),
        track_id=jnp.where(expired, -1, ts.track_id),
        activated=ts.activated & ~expired,
    )


def bytetrack_step(
    ts: TrackerState,
    det: Detections,
    cfg: TrackerConfig,
    frame_rate: int = 30,
    det_emb: jax.Array | None = None,   # (D, E) BoT-SORT appearance feats
    gmc_warp: jax.Array | None = None,   # (2, 3) camera-motion affine [A|b]
) -> Tuple[TrackerState, jax.Array]:
    """Advance the tracker one frame.

    Returns (new_state, det_track_ids (D,) int32): the persistent id each
    detection slot received, or -1 (unmatched / not yet activated — matching
    ultralytics, which only reports activated tracks).

    With `det_emb` (and `cfg.with_reid`), the first association fuses
    appearance cost BoT-SORT-style; with `gmc_warp`, predicted tracks are
    motion-compensated before matching (see rt3d/tracking/botsort.py).
    """
    s = ts.mean.shape[0]
    d = det.capacity
    use_reid = det_emb is not None and cfg.with_reid
    frame_id = ts.frame_id + 1
    ts = ts.replace(frame_id=frame_id)

    high = det.valid & (det.scores >= cfg.track_high_thresh)
    low = det.valid & (det.scores > cfg.track_low_thresh) & (
        det.scores < cfg.track_high_thresh
    )
    det_xyah = xyxy_to_xyah(det.boxes)

    # --- predict all live slots (lost tracks get vh zeroed, STrack.predict)
    ts = _predict_tracks(ts, gmc_warp)

    was_tracked = ts.state == TRACKED
    pool = (was_tracked & ts.activated) | (ts.state == LOST)
    unconfirmed = was_tracked & ~ts.activated

    # --- round 1: pool x high
    method = getattr(cfg, "assignment", "greedy")
    _, r1_row_of_col = _assoc_round(
        ts, det.boxes, det.scores, pool, high, cfg.match_thresh, cfg.fuse_score,
        method,
        det_emb=det_emb if use_reid else None,
        cfg=cfg if use_reid else None,
    )
    r1_matched_slot = jnp.zeros((s,), bool).at[
        jnp.where(r1_row_of_col >= 0, r1_row_of_col, s)
    ].set(True, mode="drop")
    ts = _apply_matches(ts, r1_row_of_col, det_xyah, det.scores, det.classes)

    # --- round 2: leftover *tracked* pool x low  (gate 0.5, plain IoU)
    r2_rows = pool & was_tracked & ~r1_matched_slot
    _, r2_row_of_col = _assoc_round(
        ts, det.boxes, det.scores, r2_rows, low, 0.5, False, method
    )
    r2_matched_slot = jnp.zeros((s,), bool).at[
        jnp.where(r2_row_of_col >= 0, r2_row_of_col, s)
    ].set(True, mode="drop")
    ts = _apply_matches(ts, r2_row_of_col, det_xyah, det.scores, det.classes)

    # unmatched tracked pool slots -> lost
    to_lost = r2_rows & ~r2_matched_slot
    ts = ts.replace(state=jnp.where(to_lost, LOST, ts.state))

    # --- round 3: unconfirmed x leftover high (gate 0.7, fused)
    det_taken = (r1_row_of_col >= 0) | (r2_row_of_col >= 0)
    rem_high = high & ~det_taken
    _, r3_row_of_col = _assoc_round(
        ts, det.boxes, det.scores, unconfirmed, rem_high, 0.7, cfg.fuse_score,
        method,
    )
    r3_matched_slot = jnp.zeros((s,), bool).at[
        jnp.where(r3_row_of_col >= 0, r3_row_of_col, s)
    ].set(True, mode="drop")
    ts = _apply_matches(ts, r3_row_of_col, det_xyah, det.scores, det.classes)

    # unmatched unconfirmed -> removed
    ts = ts.replace(
        state=jnp.where(unconfirmed & ~r3_matched_slot, EMPTY, ts.state)
    )

    # --- new tracks from leftover high dets
    det_taken = det_taken | (r3_row_of_col >= 0)
    is_new = rem_high & (r3_row_of_col < 0) & (det.scores > cfg.new_track_thresh)
    ts, placeable, scatter_slot, ids_for_new = _spawn_new_tracks(
        ts, is_new, det_xyah, det.scores, det.classes, frame_id
    )
    cols = jnp.arange(d, dtype=jnp.int32)

    # --- appearance feature maintenance (BoT-SORT EMA, botsort.py)
    if use_reid:
        from rt3d.tracking.botsort import update_smooth_features

        slot_det = jnp.full((s,), -1, jnp.int32)
        for roc in (r1_row_of_col, r2_row_of_col, r3_row_of_col):
            slot_det = slot_det.at[
                jnp.where(roc >= 0, roc, s)
            ].set(cols, mode="drop")
        fresh = jnp.zeros((s,), bool).at[scatter_slot].set(True, mode="drop")
        slot_det_new = slot_det.at[scatter_slot].set(cols, mode="drop")
        ts = ts.replace(emb=update_smooth_features(
            ts.emb, det_emb, slot_det_new, fresh
        ))

    # --- lost aging (max_time_lost = frame_rate/30 * track_buffer)
    ts = _expire_lost(ts, frame_id, cfg, frame_rate)

    # --- per-detection ids (activated slots only, like ultralytics output)
    def ids_from(row_of_col):
        slot = jnp.clip(row_of_col, 0, s - 1)
        ok = (row_of_col >= 0) & ts.activated[slot]
        return jnp.where(ok, ts.track_id[slot], -1)

    det_ids = jnp.maximum(
        jnp.maximum(ids_from(r1_row_of_col), ids_from(r2_row_of_col)),
        ids_from(r3_row_of_col),
    )
    new_ids = jnp.where(
        placeable & (frame_id == 1), ids_for_new, -1
    )
    det_ids = jnp.maximum(det_ids, new_ids).astype(jnp.int32)
    return ts, det_ids
