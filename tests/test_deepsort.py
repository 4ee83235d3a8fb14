"""DeepSORT tests: Mahalanobis gating oracle, appearance-primary
association, gate behavior, life cycle, and pipeline wiring.

Reference behavior spec: DeepSORT (Wojke et al.) as shipped in the
ultralytics stack the reference drives via `model.track`
(`/root/reference/2cam/vision_pipeline_utils.py:258-277`); BASELINE
configs[3] names the appearance-embedding tracking capability.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from rt3d.config import TrackerConfig
from rt3d.tracking import bytetrack_init, deepsort_step, gating_distance
from rt3d.tracking.kalman import (
    STD_POS,
    kalman_initiate,
    kalman_predict,
    xyxy_to_xyah,
)

from tests.test_tracking import _dets

DS_CFG = TrackerConfig(tracker_type="deepsort", with_reid=True)


def _emb(vecs, capacity=8, dim=64):
    """L2-normalized embeddings for the first len(vecs) det slots; the
    rest get a fixed padding direction."""
    e = np.zeros((capacity, dim), np.float32)
    e[:, -1] = 1.0
    for i, v in enumerate(vecs):
        e[i, :] = 0.0
        e[i, v] = 1.0
    return jnp.asarray(e)


# ---------------------------------------------------------------------------
# gating distance
# ---------------------------------------------------------------------------


def test_gating_distance_matches_oracle(rng):
    """gating_distance == d^T S^-1 d with S the PROJECTED innovation
    covariance (DeepSORT kalman_filter.gating_distance)."""
    xyah = rng.uniform(50, 300, (5, 4)).astype(np.float32)
    xyah[:, 2] = rng.uniform(0.4, 1.2, 5)
    mean, cov = kalman_initiate(jnp.asarray(xyah))
    mean, cov = kalman_predict(mean, cov)
    meas = rng.uniform(50, 300, (7, 4)).astype(np.float32)
    meas[:, 2] = rng.uniform(0.4, 1.2, 7)

    got = np.asarray(gating_distance(mean, cov, jnp.asarray(meas)))
    got_pos = np.asarray(
        gating_distance(mean, cov, jnp.asarray(meas), only_position=True)
    )

    m = np.asarray(mean)
    p = np.asarray(cov)
    for i in range(5):
        h = m[i, 3]
        r = np.diag(
            np.array([STD_POS * h, STD_POS * h, 1e-1, STD_POS * h]) ** 2
        )
        s = p[i, :4, :4] + r
        for j in range(7):
            d = meas[j] - m[i, :4]
            want = float(d @ np.linalg.solve(s, d))
            np.testing.assert_allclose(got[i, j], want, rtol=2e-3,
                                       err_msg=f"({i},{j})")
            want2 = float(d[:2] @ np.linalg.solve(s[:2, :2], d[:2]))
            np.testing.assert_allclose(got_pos[i, j], want2, rtol=2e-3)


# ---------------------------------------------------------------------------
# association semantics
# ---------------------------------------------------------------------------


def test_deepsort_appearance_resolves_swap():
    """Two nearby same-size objects swap positions; motion/IoU alone is a
    coin flip, appearance must keep the identities."""
    ts = bytetrack_init(16)
    step = jax.jit(
        lambda ts, det, emb: deepsort_step(ts, det, DS_CFG, det_emb=emb)
    )
    # large boxes, 40 px apart: both dets are within each other's
    # chi-square gate, so only appearance disambiguates
    box_a = [100, 100, 300, 300]
    box_b = [140, 100, 340, 300]
    emb = _emb([0, 1])
    ts, ids = step(ts, _dets([box_a, box_b], [0.9, 0.9], [39, 39]), emb)
    assert ids.tolist()[:2] == [1, 2]
    ts, ids = step(ts, _dets([box_a, box_b], [0.9, 0.9], [39, 39]), emb)
    assert ids.tolist()[:2] == [1, 2]
    # swap: det slot 0 now has B's appearance at A's position and vice
    # versa — IDs must follow the embeddings, not the det order/boxes
    ts, ids = step(ts, _dets([box_a, box_b], [0.9, 0.9], [39, 39]),
                   _emb([1, 0]))
    assert ids.tolist()[:2] == [2, 1]


def test_deepsort_gate_blocks_far_jump():
    """A detection with a PERFECT appearance match but far outside the
    track's motion gate must not be associated (it spawns a new track)."""
    ts = bytetrack_init(16)
    step = jax.jit(
        lambda ts, det, emb: deepsort_step(ts, det, DS_CFG, det_emb=emb)
    )
    emb = _emb([0])
    ts, ids = step(ts, _dets([[100, 100, 140, 180]], [0.9], [39]), emb)
    assert int(ids[0]) == 1
    ts, _ = step(ts, _dets([[100, 100, 140, 180]], [0.9], [39]), emb)
    # same embedding, teleported across the frame: Mahalanobis >> gate
    ts, ids = step(ts, _dets([[900, 600, 940, 680]], [0.9], [39]), emb)
    assert int(ids[0]) == -1  # unconfirmed new track, no id yet
    ts, ids = step(ts, _dets([[900, 600, 940, 680]], [0.9], [39]), emb)
    assert int(ids[0]) == 2  # confirmed on the second hit


def test_deepsort_lost_reacquired_by_appearance():
    """After a miss the track goes lost; round 1 includes lost tracks, so
    appearance re-acquires the SAME id when the object returns."""
    ts = bytetrack_init(16)
    step = jax.jit(
        lambda ts, det, emb: deepsort_step(ts, det, DS_CFG, det_emb=emb)
    )
    box = [[50, 50, 150, 250]]
    emb = _emb([3])
    ts, _ = step(ts, _dets(box, [0.9], [39]), emb)
    ts, _ = step(ts, _dets(box, [0.9], [39]), emb)
    for _ in range(3):
        ts, _ = step(ts, _dets(np.zeros((0, 4), np.float32), [], []),
                     _emb([]))
    ts, ids = step(ts, _dets(np.asarray(box) + 4.0, [0.9], [39]), emb)
    assert int(ids[0]) == 1


def test_deepsort_no_low_conf_round():
    """DeepSORT has a single confidence threshold: a low-score detection
    (ByteTrack's second round would hold it) is ignored entirely."""
    ts = bytetrack_init(16)
    step = jax.jit(
        lambda ts, det, emb: deepsort_step(ts, det, DS_CFG, det_emb=emb)
    )
    box = [[50, 50, 150, 250]]
    emb = _emb([3])
    ts, ids = step(ts, _dets(box, [0.9], [39]), emb)
    assert int(ids[0]) == 1
    ts, ids = step(ts, _dets(box, [0.3], [39]), emb)  # below high thresh
    assert int(ids[0]) == -1  # not associated; track aged, not updated


def test_deepsort_cascade_prefers_recent_track():
    """Two confirmed tracks with IDENTICAL appearance: the one seen more
    recently wins the single ambiguous detection (the age-penalty analog
    of DeepSORT's matching cascade)."""
    ts = bytetrack_init(16)
    step = jax.jit(
        lambda ts, det, emb: deepsort_step(ts, det, DS_CFG, det_emb=emb)
    )
    same = _emb([5, 5])
    one = _emb([5])
    box_a = [100, 100, 300, 300]
    box_b = [160, 100, 360, 300]
    # confirm both tracks
    ts, _ = step(ts, _dets([box_a, box_b], [0.9, 0.9], [39, 39]), same)
    ts, ids = step(ts, _dets([box_a, box_b], [0.9, 0.9], [39, 39]), same)
    assert ids.tolist()[:2] == [1, 2]
    # track 2 misses two frames (track 1 keeps updating)
    ts, _ = step(ts, _dets([box_a], [0.9], [39]), one)
    ts, _ = step(ts, _dets([box_a], [0.9], [39]), one)
    # one detection BETWEEN the two tracks, equal appearance: the
    # recently-updated track 1 must take it
    mid = [130, 100, 330, 300]
    ts, ids = step(ts, _dets([mid], [0.9], [39]), one)
    assert int(ids[0]) == 1


# ---------------------------------------------------------------------------
# pipeline wiring
# ---------------------------------------------------------------------------


def test_deepsort_pipeline_track_wiring():
    """build_pipeline(tracker_type='deepsort') produces embeddings in
    detect() and routes track() through deepsort_step under jit."""
    from rt3d.pipeline.step import build_pipeline
    from tests.tiny import tiny_config

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, tracker=dataclasses.replace(
            cfg.tracker, tracker_type="deepsort", with_reid=True)
    )
    pipe = build_pipeline(cfg)
    params = pipe.model.init(jax.random.PRNGKey(0))
    state = pipe.init_state()
    rgb = jnp.zeros((2, 96, 160, 3), jnp.uint8)
    det, protos, emb = jax.jit(pipe.detect)(params, pipe.preprocess(rgb))
    assert emb is not None and emb.shape[-1] == cfg.tracker.emb_dim
    state2, ids = jax.jit(pipe.track)(state, det, emb)
    assert ids.shape == (2, cfg.model.max_detections)
    # tracker state advanced
    assert int(state2.tracker.frame_id[0]) == 1


def test_deepsort_rejects_unknown_tracker():
    from rt3d.pipeline.step import build_pipeline
    from tests.tiny import tiny_config

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, tracker=dataclasses.replace(cfg.tracker, tracker_type="sort")
    )
    try:
        build_pipeline(cfg)
    except ValueError as e:
        assert "tracker_type" in str(e)
    else:
        raise AssertionError("unknown tracker_type accepted")
