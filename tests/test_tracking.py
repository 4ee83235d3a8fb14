"""Tracking tests: Kalman numerics, LAP vs scipy, ByteTrack life cycle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rt3d.config import TrackerConfig
from rt3d.models.yolo.postprocess import Detections
from rt3d.tracking import (
    TrackerState,
    bytetrack_init,
    bytetrack_step,
    hungarian,
    kalman_initiate,
    kalman_predict,
    kalman_update,
    solve_matching,
    xyah_to_xyxy,
    xyxy_to_xyah,
)


def test_xyah_roundtrip(rng):
    boxes = rng.uniform(0, 100, (10, 2))
    wh = rng.uniform(5, 40, (10, 2))
    xyxy = np.concatenate([boxes, boxes + wh], axis=-1).astype(np.float32)
    back = np.asarray(xyah_to_xyxy(xyxy_to_xyah(jnp.asarray(xyxy))))
    np.testing.assert_allclose(back, xyxy, rtol=1e-5, atol=1e-3)


def test_kalman_predict_update_converges():
    # constant-velocity target; after several predict/update cycles the
    # state should track position closely
    z0 = jnp.asarray([10.0, 20.0, 0.5, 40.0])
    mean, cov = kalman_initiate(z0)
    pos = np.array([10.0, 20.0])
    vel = np.array([2.0, -1.0])
    for t in range(1, 12):
        mean, cov = kalman_predict(mean, cov)
        z = jnp.asarray([pos[0] + vel[0] * t, pos[1] + vel[1] * t, 0.5, 40.0])
        mean, cov = kalman_update(mean, cov, z)
    m = np.asarray(mean)
    np.testing.assert_allclose(m[:2], pos + vel * 11, atol=1.0)
    np.testing.assert_allclose(m[4:6], vel, atol=0.5)
    # covariance stays SPD-ish
    assert np.all(np.linalg.eigvalsh(np.asarray(cov)) > -1e-4)


@pytest.mark.parametrize("n", [3, 8, 16])
def test_hungarian_matches_scipy(rng, n):
    scipy_opt = pytest.importorskip("scipy.optimize")
    for trial in range(4):
        cost = rng.uniform(0, 1, (n, n)).astype(np.float32)
        col = np.asarray(hungarian(jnp.asarray(cost)))
        ours = cost[np.arange(n), col].sum()
        r, c = scipy_opt.linear_sum_assignment(cost)
        best = cost[r, c].sum()
        assert abs(ours - best) < 1e-3, (trial, ours, best)
        assert len(set(col.tolist())) == n  # a permutation


def test_greedy_rounds_bit_identical_to_sequential():
    """The mutual-minimum acceptance rounds in solve_matching_greedy must
    select EXACTLY the pairs of the defining sequential procedure (claim
    the globally cheapest feasible pair, mask its row+column, repeat) —
    including under heavy cost ties, where both sides rely on argmin's
    lowest-index tie-break."""
    from rt3d.tracking.assignment import solve_matching_greedy

    big = 1e9

    def sequential_oracle(cost, thresh):
        r, c = cost.shape
        cm = np.where(cost < thresh, cost, big)
        cor = -np.ones(r, np.int32)
        roc = -np.ones(c, np.int32)
        for _ in range(min(r, c)):
            flat = np.argmin(cm)
            i, j = flat // c, flat % c
            if cm[i, j] >= big:
                break
            cor[i], roc[j] = j, i
            cm[i, :] = big
            cm[:, j] = big
        return cor, roc

    rng = np.random.default_rng(0)
    for trial in range(300):
        r = int(rng.integers(0, 9))
        c = int(rng.integers(0, 9))
        if rng.random() < 0.5:  # tie-heavy integer costs
            cost = rng.integers(0, 4, (r, c)).astype(np.float32)
        else:
            cost = (rng.random((r, c)) * 2).astype(np.float32)
        thresh = float(rng.choice([0.5, 1.0, 3.0]))
        want = sequential_oracle(cost, thresh)
        got = solve_matching_greedy(jnp.asarray(cost), thresh)
        np.testing.assert_array_equal(np.asarray(got[0]), want[0],
                                      err_msg=f"trial {trial} cols")
        np.testing.assert_array_equal(np.asarray(got[1]), want[1],
                                      err_msg=f"trial {trial} rows")


def test_solve_matching_threshold_and_rect(rng):
    cost = np.array(
        [[0.1, 0.9, 0.8], [0.85, 0.2, 0.95]], dtype=np.float32
    )
    col_of_row, row_of_col = solve_matching(jnp.asarray(cost), thresh=0.5)
    np.testing.assert_array_equal(np.asarray(col_of_row), [0, 1])
    np.testing.assert_array_equal(np.asarray(row_of_col), [0, 1, -1])
    # everything over threshold -> no matches
    col_of_row, row_of_col = solve_matching(jnp.asarray(cost), thresh=0.05)
    assert (np.asarray(col_of_row) == -1).all()
    assert (np.asarray(row_of_col) == -1).all()


def _dets(boxes, scores, classes, capacity=8):
    d = len(boxes)
    b = np.zeros((capacity, 4), np.float32)
    s = np.zeros((capacity,), np.float32)
    c = np.zeros((capacity,), np.int32)
    v = np.zeros((capacity,), bool)
    b[:d] = boxes
    s[:d] = scores
    c[:d] = classes
    v[:d] = True
    return Detections(
        boxes=jnp.asarray(b), scores=jnp.asarray(s),
        classes=jnp.asarray(c), coeffs=jnp.zeros((capacity, 4)),
        valid=jnp.asarray(v),
    )


CFG = TrackerConfig()


def test_bytetrack_basic_identity_persistence():
    ts = bytetrack_init(16)
    step = jax.jit(lambda ts, det: bytetrack_step(ts, det, CFG))

    box = np.array([[100, 100, 150, 200]], np.float32)
    ts, ids0 = step(ts, _dets(box, [0.9], [39]))
    assert int(ids0[0]) == 1  # frame 1 -> activated immediately

    # moving slowly; id persists
    for k in range(1, 6):
        moved = box + np.array([3.0 * k, 0, 3.0 * k, 0], np.float32)
        ts, ids = step(ts, _dets(moved, [0.9], [39]))
        assert int(ids[0]) == 1, k


def test_bytetrack_two_hit_activation():
    ts = bytetrack_init(16)
    step = jax.jit(lambda ts, det: bytetrack_step(ts, det, CFG))
    # frame 1: one track (id 1, activated)
    ts, _ = step(ts, _dets([[0, 0, 10, 10]], [0.9], [0]))
    # frame 2: a NEW det far away -> unconfirmed, no id reported yet
    ts, ids = step(ts, _dets([[0, 0, 10, 10], [200, 200, 230, 240]], [0.9, 0.9], [0, 0]))
    assert int(ids[0]) == 1
    assert int(ids[1]) == -1  # not yet activated
    # frame 3: matched again -> activated, gets its id
    ts, ids = step(ts, _dets([[0, 0, 10, 10], [201, 201, 231, 241]], [0.9, 0.9], [0, 0]))
    assert int(ids[0]) == 1
    assert int(ids[1]) == 2


def test_bytetrack_low_conf_second_association():
    ts = bytetrack_init(16)
    step = jax.jit(lambda ts, det: bytetrack_step(ts, det, CFG))
    box = np.array([[50, 50, 90, 120]], np.float32)
    ts, ids = step(ts, _dets(box, [0.9], [39]))
    assert int(ids[0]) == 1
    # detection drops to low confidence (0.3 in [low, high)) — the second
    # association should still hold the identity
    ts, ids = step(ts, _dets(box + 2.0, [0.3], [39]))
    assert int(ids[0]) == 1


def test_bytetrack_lost_and_reacquired():
    ts = bytetrack_init(16)
    step = jax.jit(lambda ts, det: bytetrack_step(ts, det, CFG))
    box = np.array([[50, 50, 90, 120]], np.float32)
    ts, _ = step(ts, _dets(box, [0.9], [39]))
    ts, _ = step(ts, _dets(box, [0.9], [39]))
    # object disappears for a few frames
    for _ in range(3):
        ts, _ = step(ts, _dets(np.zeros((0, 4), np.float32), [], []))
    # reappears near the old position -> same id (track was lost, not removed)
    ts, ids = step(ts, _dets(box + 1.0, [0.9], [39]))
    assert int(ids[0]) == 1


def test_bytetrack_state_is_a_pytree():
    ts = bytetrack_init(8)
    leaves = jax.tree_util.tree_leaves(ts)
    assert all(hasattr(l, "shape") for l in leaves)
    # flatten/unflatten round trip (checkpointability)
    flat, treedef = jax.tree_util.tree_flatten(ts)
    ts2 = jax.tree_util.tree_unflatten(treedef, flat)
    assert np.asarray(ts2.next_id) == np.asarray(ts.next_id)
