"""Tests for the vectorized greedy centroid fusion."""

import numpy as np
import jax.numpy as jnp

from rt3d.geometry.fusion import ObjectSet, flatten_objects, fuse_centroid, greedy_centroid_match
from tests import oracles


def _make_set(objs, num_slots=6, cap=64):
    """objs: list of (points ndarray, class_id)."""
    s = ObjectSet.empty(num_slots, cap)
    pts = np.zeros((num_slots, cap, 3), np.float32)
    val = np.zeros((num_slots, cap), bool)
    cls = np.full(num_slots, -1, np.int32)
    pres = np.zeros(num_slots, bool)
    tid = np.full(num_slots, -1, np.int32)
    for i, (p, c) in enumerate(objs):
        pts[i, : len(p)] = p
        val[i, : len(p)] = True
        cls[i] = c
        pres[i] = True
        tid[i] = i + 1
    return ObjectSet(
        points=jnp.asarray(pts), valid=jnp.asarray(val), class_id=jnp.asarray(cls),
        present=jnp.asarray(pres), track_id=jnp.asarray(tid),
    )


def _cluster(rng, center, n=40, s=0.01):
    return (center + rng.normal(0, s, (n, 3))).astype(np.float32)


def test_one_v_one_fuses_unconditionally(rng):
    # centroids far beyond threshold but single instance per class per cam
    a = _cluster(rng, [0.0, 0.0, 0.5])
    b = _cluster(rng, [5.0, 0.0, 0.5])
    s1 = _make_set([(a, 39)])
    s2 = _make_set([(b, 39)])
    match, matched2 = greedy_centroid_match(s1, s2, distance_threshold=0.3)
    assert int(match[0]) == 0
    assert bool(matched2[0])


def test_greedy_matching_vs_oracle(rng):
    # two bottles + one cup from cam1; two bottles + one bowl from cam2
    b1a = _cluster(rng, [0.0, 0.0, 0.5])
    b1b = _cluster(rng, [0.5, 0.0, 0.5])
    cup1 = _cluster(rng, [0.2, 0.3, 0.5])
    b2a = _cluster(rng, [0.02, 0.0, 0.5])     # near b1a
    b2b = _cluster(rng, [0.52, 0.01, 0.5])    # near b1b
    bowl2 = _cluster(rng, [0.8, 0.8, 0.5])
    objs1 = [(b1a, 39), (b1b, 39), (cup1, 41)]
    objs2 = [(b2a, 39), (b2b, 39), (bowl2, 45)]

    s1 = _make_set(objs1)
    s2 = _make_set(objs2)
    fused = fuse_centroid(s1, s2, 0.3, apply_sor=False)
    expect = oracles.fuse_oracle(objs1, objs2, 0.3)

    got = []
    for i in range(fused.num_slots):
        if bool(fused.present[i]):
            p = np.asarray(fused.points[i])[np.asarray(fused.valid[i])]
            got.append((p, int(fused.class_id[i])))
    assert len(got) == len(expect)
    for (gp, gc), (ep, ec, _) in zip(got, expect):
        assert gc == ec
        np.testing.assert_allclose(
            np.sort(gp, axis=0), np.sort(ep, axis=0), atol=1e-6
        )


def test_match_respects_threshold(rng):
    # two objects of same class per camera, all far apart -> no matches
    objs1 = [(_cluster(rng, [0, 0, 0.5]), 39), (_cluster(rng, [1, 0, 0.5]), 39)]
    objs2 = [(_cluster(rng, [0, 5, 0.5]), 39), (_cluster(rng, [1, 5, 0.5]), 39)]
    s1, s2 = _make_set(objs1), _make_set(objs2)
    match, matched2 = greedy_centroid_match(s1, s2, 0.3)
    assert int(match[0]) == -1 and int(match[1]) == -1
    assert not bool(matched2.any())
    fused = fuse_centroid(s1, s2, 0.3, apply_sor=False)
    assert int(np.asarray(fused.present).sum()) == 4


def test_sor_applied_to_fused_pairs(rng):
    a = _cluster(rng, [0, 0, 0.5], n=60, s=0.01)
    b = _cluster(rng, [0.01, 0, 0.5], n=60, s=0.01)
    # poison cam1 cloud with a wild outlier
    a = np.vstack([a, np.array([[10.0, 10.0, 10.0]], np.float32)])
    s1 = _make_set([(a, 39)], cap=128)
    s2 = _make_set([(b, 39)], cap=128)
    fused = fuse_centroid(s1, s2, 0.3, apply_sor=True)
    pts = np.asarray(fused.points[0])[np.asarray(fused.valid[0])]
    assert np.linalg.norm(pts, axis=1).max() < 2.0  # outlier gone
    assert len(pts) >= 100


def test_flatten_objects(rng):
    objs1 = [(_cluster(rng, [0, 0, 0.5]), 39)]
    objs2 = [(_cluster(rng, [0.01, 0, 0.5]), 39)]
    s1, s2 = _make_set(objs1), _make_set(objs2)
    fused = fuse_centroid(s1, s2, 0.3, apply_sor=False)
    buf, overflow = flatten_objects(fused, capacity=256)
    pts = np.asarray(buf.points)[np.asarray(buf.valid)]
    assert len(pts) == 80
    assert int(overflow) == 0


def test_rounds_match_equals_scan_spec_fuzz(rng):
    """The prefix-accepting proposal-rounds matcher must be BIT-identical
    to the sequential slot-order scan spec (greedy_centroid_match_scan) —
    including argmin tie-breaks, the 1-vs-1 unconditional path, absent
    slots, and contested columns that force multiple rounds."""
    from rt3d.geometry.fusion import greedy_centroid_match_scan

    for trial in range(60):
        n1 = int(rng.integers(0, 7))
        n2 = int(rng.integers(0, 7))
        # few classes + quantized coords force collisions and exact ties
        objs1 = [(_cluster(rng, rng.integers(0, 3, 3) * 0.1, n=4, s=0.0), int(rng.integers(39, 42)))
                 for _ in range(n1)]
        objs2 = [(_cluster(rng, rng.integers(0, 3, 3) * 0.1, n=4, s=0.0), int(rng.integers(39, 42)))
                 for _ in range(n2)]
        s1 = _make_set(objs1, num_slots=8)
        s2 = _make_set(objs2, num_slots=8)
        thr = float(rng.choice([0.05, 0.15, 0.5]))
        m_r, m2_r = greedy_centroid_match(s1, s2, thr)
        m_s, m2_s = greedy_centroid_match_scan(s1, s2, thr)
        np.testing.assert_array_equal(np.asarray(m_r), np.asarray(m_s))
        np.testing.assert_array_equal(np.asarray(m2_r), np.asarray(m2_s))


def test_sor_slots_equals_per_slot_loop(rng):
    """sor_inlier_mask_slots must match per-slot sor_inlier_mask exactly
    (shared stats helper; same kNN math) including absent/padding slots."""
    from rt3d.geometry.sor import sor_inlier_mask, sor_inlier_mask_slots

    S, K = 5, 64
    pts = rng.normal(0, 0.2, (S, K, 3)).astype(np.float32)
    val = rng.uniform(size=(S, K)) < 0.7
    val[2] = False          # fully absent slot
    val[3, 8:] = False      # tiny cloud
    got = np.asarray(sor_inlier_mask_slots(
        jnp.asarray(pts), jnp.asarray(val), nb_neighbors=10, std_ratio=1.5))
    for s in range(S):
        want = np.asarray(sor_inlier_mask(
            jnp.asarray(pts[s]), jnp.asarray(val[s]),
            nb_neighbors=10, std_ratio=1.5))
        np.testing.assert_array_equal(got[s], want)
