"""Greedy vs exact (Hungarian) assignment, quantified (VERDICT r1 #6).

The default solver is greedy (`TrackerConfig.assignment='greedy'`) because
the exact solver's nested sequential loops cost ~100 ms/frame of pure TPU
latency at 64x20 (rt3d/tracking/assignment.py). The reference uses exact
lapjv via ultralytics (`/root/reference/requirements.txt:42`). This file
measures what the approximation actually costs on crowded crossing
scenarios: solver-level optimality gap and tracker-level ID-switch
disagreement.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rt3d.config import TrackerConfig
from rt3d.models.yolo.postprocess import Detections
from rt3d.tracking import bytetrack_init, bytetrack_step
from rt3d.tracking.assignment import (
    solve_matching_exact,
    solve_matching_greedy,
)

D = 16  # detection slots


def _crossing_scene(num_objects: int, frames: int, noise: float, seed: int):
    """Ground-truth boxes for objects on straight crossing paths: everyone
    moves through the image centre at a different angle, so every pair of
    trajectories crosses mid-sequence — the hardest case for association."""
    rng = np.random.default_rng(seed)
    angles = np.linspace(0, 2 * np.pi, num_objects, endpoint=False)
    angles += rng.uniform(0, 0.2, num_objects)
    start = 320 + 260 * np.stack([np.cos(angles), np.sin(angles)], -1)
    end = 320 - 260 * np.stack([np.cos(angles), np.sin(angles)], -1)
    size = rng.uniform(50, 80, (num_objects, 2))
    gt = np.zeros((frames, num_objects, 4), np.float32)
    for t in range(frames):
        a = t / (frames - 1)
        c = start * (1 - a) + end * a + rng.normal(0, noise, (num_objects, 2))
        gt[t, :, :2] = c - size / 2
        gt[t, :, 2:] = c + size / 2
    return gt


def _detections_from_gt(gt_t: np.ndarray, rng) -> Detections:
    n = gt_t.shape[0]
    boxes = np.zeros((D, 4), np.float32)
    boxes[:n] = gt_t
    # order shuffled every frame: association can't ride slot order
    perm = rng.permutation(n)
    boxes[:n] = boxes[perm]
    scores = np.zeros((D,), np.float32)
    scores[:n] = rng.uniform(0.7, 0.95, n)
    valid = np.zeros((D,), bool)
    valid[:n] = True
    return Detections(
        boxes=jnp.asarray(boxes), scores=jnp.asarray(scores),
        classes=jnp.zeros((D,), jnp.int32), coeffs=jnp.zeros((D, 4)),
        valid=jnp.asarray(valid),
    ), perm


def _run_tracker(method: str, gts, seed: int):
    cfg = TrackerConfig(max_tracks=32, assignment=method)
    step = jax.jit(
        lambda ts, det: bytetrack_step(ts, det, cfg, frame_rate=30)
    )
    ts = bytetrack_init(cfg.max_tracks)
    rng = np.random.default_rng(seed + 99)
    frames, n, _ = gts.shape
    # ids_by_object[t, k] = track id assigned to GT object k at frame t
    ids_by_object = np.full((frames, n), -1, np.int64)
    for t in range(frames):
        det, perm = _detections_from_gt(gts[t], rng)
        ts, ids = step(ts, det)
        ids = np.asarray(ids)
        for slot, obj in enumerate(perm):
            ids_by_object[t, obj] = ids[slot]
    return ids_by_object


def _id_switches(ids_by_object: np.ndarray) -> int:
    """Count of frames where a GT object's track id changed (both ids
    real). The standard MOT IDSW event, per object, summed."""
    sw = 0
    for k in range(ids_by_object.shape[1]):
        seq = ids_by_object[:, k]
        seq = seq[seq >= 0]
        sw += int(np.sum(seq[1:] != seq[:-1]))
    return sw


def test_solver_optimality_gap_on_random_costs():
    """Solver-level: greedy's total cost vs exact on random matrices, and
    both solvers must match 1:1 when the cost structure is unambiguous."""
    rng = np.random.default_rng(0)
    gaps = []
    for _ in range(50):
        cost = rng.uniform(0, 1, (12, 9)).astype(np.float32)
        ge, _ = solve_matching_exact(jnp.asarray(cost), 0.8)
        gg, _ = solve_matching_greedy(jnp.asarray(cost), 0.8)
        ge, gg = np.asarray(ge), np.asarray(gg)
        # same feasibility maximization: equal match counts is NOT
        # guaranteed for greedy in theory; measure it
        def total(col_of_row):
            rows = np.where(col_of_row >= 0)[0]
            return cost[rows, col_of_row[rows]].sum(), len(rows)

        ce, ne = total(ge)
        cg, ng = total(gg)
        assert ng <= ne
        gaps.append((cg - ce, ne - ng))
    cost_gap = np.mean([g[0] for g in gaps])
    lost_matches = np.sum([g[1] for g in gaps])
    # random uniform costs are the WORST case for greedy; on tracking IoU
    # matrices costs are near-binary. Record the envelope.
    assert lost_matches <= 10, f"greedy dropped {lost_matches} matches / 50"
    assert cost_gap < 0.5, f"mean optimality gap {cost_gap:.3f}"


@pytest.mark.parametrize("noise", [1.0, 6.0])
def test_id_switch_disagreement_on_crossings(noise):
    """Tracker-level: 10 objects all crossing the image centre, 40 frames,
    detection jitter `noise` px, all three solver modes.

    Measured envelope (3 seeds x 40 frames, this scenario; v5e latency per
    tracker step in parentheses):

      noise px | greedy (0.6ms) | refined (3.4ms) | exact (100ms)
      ---------|----------------|-----------------|--------------
         1-2   |      0-15      |      0-11       |     0-5
          3    |       33       |       23        |      23
          4    |       55       |       43        |      42
          6    |       91       |       82        |      73

    Greedy==exact at realistic jitter (<=1 px at HD720); under heavy
    jitter through a 10-way crossing greedy pays ~25% more ID switches —
    that is the cost of the 170x latency win, and `refined` buys most of
    it back for 5x. This is the data behind TrackerConfig.assignment's
    default."""
    gts = _crossing_scene(num_objects=10, frames=40, noise=noise, seed=3)
    ids_g = _run_tracker("greedy", gts, seed=3)
    ids_r = _run_tracker("refined", gts, seed=3)
    ids_e = _run_tracker("exact", gts, seed=3)

    sw_g, sw_r, sw_e = map(_id_switches, (ids_g, ids_r, ids_e))
    both = (ids_g >= 0) & (ids_e >= 0)
    disagree = float(np.mean(ids_g[both] != ids_e[both]))
    print(f"noise={noise}: IDSW greedy={sw_g} refined={sw_r} exact={sw_e} "
          f"greedy-vs-exact disagreement={disagree:.3%}")

    if noise <= 1.0:
        # clean detections: all solvers agree exactly, zero switches
        assert (sw_g, sw_r, sw_e) == (0, 0, 0)
        assert disagree == 0.0
    else:
        # heavy jitter through a 10-way crossing: bounded degradation,
        # strict quality ordering exact <= refined <= greedy
        assert sw_e <= sw_r + 2 and sw_r <= sw_g + 2, (sw_g, sw_r, sw_e)
        assert sw_g <= sw_e + 10, (sw_g, sw_e)
        # NOTE: disagreement is cumulative — one diverged ID decision keeps
        # counting for the rest of that object's life, so a handful of
        # extra switches reads as tens of percent here
        assert disagree <= 0.40, disagree
