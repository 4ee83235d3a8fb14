"""Multi-camera per-object point-cloud fusion by centroid matching.

Reimplements the intent of the reference's `fuse_point_clouds_centroid`
(`2cam/vision_pipeline_utils.py:88-165`) on fixed-shape object slots:

* objects are grouped by class id;
* when each camera contributes exactly ONE cloud of a class, the pair is
  fused unconditionally (the reference's 1-vs-1 fast path, `:123-126`,
  which never consults the distance threshold);
* otherwise cam1 clouds greedily claim, in slot order, the nearest-centroid
  unclaimed cam2 cloud of the same class within `distance_threshold`
  (`:129-155`); matched cam2 clouds are removed from further matching;
* unmatched clouds from either camera pass through as their own objects
  (`:157-163`).

Known, documented divergences from the reference (which we consider bugs in
it, see SURVEY.md §2.1):
* the reference compares a SOR-filtered cloud against raw clouds when
  removing the matched cam2 entry (`:147,155`), so removal silently never
  happens once SOR drops a point — we remove the matched entry properly;
* SOR placement: we apply SOR **after** concatenation for every fused pair
  (the reference does this in the 1-vs-1 path `:125` but SORs the parts
  separately in the N-vs-M path); unmatched cam1 clouds are SOR-filtered
  (as in `:131`), unmatched cam2 clouds pass through raw (`:162-163`).

Everything is a jitted fixed-shape program: the greedy match runs as
prefix-accepting proposal rounds (bit-identical to the sequential
slot-order spec, see `greedy_centroid_match`); SOR over the fused slots
runs as ONE slot-batched Pallas kNN launch (`sor_inlier_mask_slots` —
clouds fold to (S*K, 3), each query tile reads its owning slot's rows,
absent slots sit at the far sentinel and hit the kernel's all-far tile
skip), so empty slots cost nothing.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from rt3d.geometry.ops import PointBuffer, masked_centroid
from rt3d.geometry.sor import sor_inlier_mask_slots

_INF = jnp.float32(3.4e38)


@struct.dataclass
class ObjectSet:
    """Padded per-camera (or fused) object clouds.

    points: (S, K, 3) f32 — S object slots, K point capacity each
    valid:  (S, K) bool  — live points within each slot
    class_id: (S,) int32
    present: (S,) bool   — slot holds an object
    track_id: (S,) int32 — persistent ID from the tracker (-1 if none)
    """

    points: jax.Array
    valid: jax.Array
    class_id: jax.Array
    present: jax.Array
    track_id: jax.Array

    @property
    def num_slots(self) -> int:
        return self.points.shape[0]

    @property
    def point_capacity(self) -> int:
        return self.points.shape[1]

    @staticmethod
    def empty(num_slots: int, point_capacity: int) -> "ObjectSet":
        return ObjectSet(
            points=jnp.zeros((num_slots, point_capacity, 3), jnp.float32),
            valid=jnp.zeros((num_slots, point_capacity), bool),
            class_id=jnp.full((num_slots,), -1, jnp.int32),
            present=jnp.zeros((num_slots,), bool),
            track_id=jnp.full((num_slots,), -1, jnp.int32),
        )


def _class_counts(class_id: jax.Array, present: jax.Array, query: jax.Array) -> jax.Array:
    """For each query class value, how many present slots share it."""
    eq = (class_id[None, :] == query[:, None]) & present[None, :]
    return jnp.sum(eq.astype(jnp.int32), axis=1)


def _match_gates(set1: ObjectSet, set2: ObjectSet, distance_threshold: float):
    """(dist0 (S1,S2), gated0 (S1,S2)): centroid distances and per-pair
    feasibility (class equality, cam2 presence, threshold OR the reference's
    unconditional 1-vs-1 fast path)."""
    c1 = masked_centroid(set1.points, set1.valid)  # (S1, 3)
    c2 = masked_centroid(set2.points, set2.valid)  # (S2, 3)
    n1 = _class_counts(set1.class_id, set1.present, set1.class_id)
    n2 = _class_counts(set2.class_id, set2.present, set1.class_id)
    one_v_one = (n1 == 1) & (n2 == 1)
    dist0 = jnp.linalg.norm(c1[:, None, :] - c2[None, :, :], axis=-1)
    gated0 = (
        set2.present[None, :]
        & (set2.class_id[None, :] == set1.class_id[:, None])
        & (one_v_one[:, None] | (dist0 < distance_threshold))
    )
    return dist0, gated0


def greedy_centroid_match(
    set1: ObjectSet, set2: ObjectSet, distance_threshold: float
) -> Tuple[jax.Array, jax.Array]:
    """Greedy cam1-slot-order matching. Returns (match_idx: (S1,) int32 with
    -1 for unmatched, matched2: (S2,) bool).

    Bit-identical to the sequential slot-order spec
    (`greedy_centroid_match_scan` below, the reference's loop at
    `vision_pipeline_utils.py:129-155`) but runs as PREFIX-ACCEPTING
    PROPOSAL ROUNDS: each round every pending cam1 slot proposes its
    nearest available cam2 slot; all proposals below the first
    index-collision are accepted at once. Identity argument: accepted
    rows always have lower indices than every pending row, so a pending
    row's availability mask (`~matched2`) equals exactly the sequential
    one at its turn — its argmin (and tie-break) is therefore the
    sequential pick, and a row with no feasible candidate can never gain
    one (availability only shrinks), so it retires with -1 immediately.
    Rows above the first collision wait: the colliding row's re-proposal
    could claim their candidate. Every round retires at least one row
    (the lowest-index pending proposer is never rejected), so the loop
    converges in <= S1 rounds — measured 1-2 on tracking scenes, vs the
    scan version's S1 sequential steps of (S2,) work (~0.23 ms/step of
    `while` latency in the round-3 chip trace, fusion.py greedy scan)."""
    dist0, gated0 = _match_gates(set1, set2, distance_threshold)
    s1, s2 = dist0.shape
    rowidx = jnp.arange(s1, dtype=jnp.int32)
    big = jnp.int32(s1 + s2 + 2)

    def cond(carry):
        _, _, done = carry
        return jnp.any(set1.present & ~done)

    def body(carry):
        matched2, match, done = carry
        active = set1.present & ~done
        d = jnp.where(gated0 & ~matched2[None, :], dist0, _INF)
        j = jnp.argmin(d, axis=1)  # (S1,) proposals
        found = active & (jnp.min(d, axis=1) < _INF)
        # lowest-index pending proposer of each cam2 slot wins it
        prop = found[:, None] & (jnp.arange(s2)[None, :] == j[:, None])
        first = jnp.min(
            jnp.where(prop, rowidx[:, None], big), axis=0)  # (S2,)
        rejected = found & (first[j] < rowidx)
        r = jnp.min(jnp.where(rejected, rowidx, big))
        accept = found & (rowidx < r)
        match = jnp.where(accept, j.astype(jnp.int32), match)
        done = done | accept | (active & ~found)
        matched2 = matched2 | jnp.any(prop & accept[:, None], axis=0)
        return matched2, match, done

    matched2, match_idx, _ = jax.lax.while_loop(
        cond,
        body,
        (
            jnp.zeros((s2,), bool),
            jnp.full((s1,), -1, jnp.int32),
            ~set1.present,
        ),
    )
    return match_idx, matched2


def greedy_centroid_match_scan(
    set1: ObjectSet, set2: ObjectSet, distance_threshold: float
) -> Tuple[jax.Array, jax.Array]:
    """The sequential slot-order spec of `greedy_centroid_match`: a
    `lax.scan` over cam1 slots carrying the claimed mask — one tiny (S2,)
    argmin per slot, S1 latency-serial steps. Kept as the executable
    reference the round-based version is fuzz-tested against
    (tests/test_fusion.py)."""
    dist0, gated0 = _match_gates(set1, set2, distance_threshold)

    def step(matched2, xs):
        dist_row, gated_row, pres1 = xs
        dist = jnp.where(gated_row & ~matched2, dist_row, _INF)
        j = jnp.argmin(dist)
        found = pres1 & (dist[j] < _INF)
        match = jnp.where(found, j, -1).astype(jnp.int32)
        matched2 = matched2 | (found & (jnp.arange(set2.num_slots) == j))
        return matched2, match

    matched2, match_idx = jax.lax.scan(
        step,
        jnp.zeros((set2.num_slots,), bool),
        (dist0, gated0, set1.present),
    )
    return match_idx, matched2


def fuse_centroid(
    set1: ObjectSet,
    set2: ObjectSet,
    distance_threshold: float,
    sor_nb_neighbors: int = 20,
    sor_std_ratio: float = 1.5,
    apply_sor: bool = True,
) -> ObjectSet:
    """Fuse two cameras' object sets into one (S1 + S2 slots, 2*K points).

    Slot layout of the result: slots [0, S1) hold cam1 objects (with their
    matched cam2 points concatenated when a match exists); slots [S1, S1+S2)
    hold unmatched cam2 objects.
    """
    s1, k1 = set1.num_slots, set1.point_capacity
    s2, k2 = set2.num_slots, set2.point_capacity
    match_idx, matched2 = greedy_centroid_match(set1, set2, distance_threshold)

    # cam1-side slots: own points ++ matched cam2 points (or padding)
    safe_idx = jnp.maximum(match_idx, 0)
    partner_pts = set2.points[safe_idx]           # (S1, K2, 3)
    partner_valid = set2.valid[safe_idx] & (match_idx >= 0)[:, None]
    fused1_pts = jnp.concatenate([set1.points, partner_pts], axis=1)
    fused1_valid = jnp.concatenate([set1.valid, partner_valid], axis=1)

    # cam2-side slots: unmatched leftovers, padded to the same point capacity
    pad2 = jnp.zeros((s2, k1, 3), jnp.float32)
    left2_pts = jnp.concatenate([set2.points, pad2], axis=1)
    left2_present = set2.present & ~matched2
    left2_valid = jnp.concatenate(
        [set2.valid & left2_present[:, None], jnp.zeros((s2, k1), bool)], axis=1
    )

    points = jnp.concatenate([fused1_pts, left2_pts], axis=0)
    valid = jnp.concatenate(
        [fused1_valid & set1.present[:, None], left2_valid], axis=0
    )
    class_id = jnp.concatenate([set1.class_id, set2.class_id], axis=0)
    present = jnp.concatenate([set1.present, left2_present], axis=0)
    track_id = jnp.concatenate([set1.track_id, set2.track_id], axis=0)

    if apply_sor:
        # SOR per fused slot; fused pairs and standalone cam1 clouds get it,
        # pass-through cam2 leftovers stay raw (reference `:162-163`) —
        # so only the s1 cam1-side slots are visited. All slots run in ONE
        # slot-batched pass (one Pallas launch; absent slots' teleported
        # padding hits the kernel's all-far tile skip) — the earlier
        # sequential per-slot `lax.map` cost ~0.35 ms/step of while-loop
        # dispatch on the x chip trace.
        sor_mask = sor_inlier_mask_slots(
            points[:s1], valid[:s1], sor_nb_neighbors, sor_std_ratio
        )
        valid1 = jnp.where(set1.present[:, None], sor_mask, valid[:s1])
        valid = jnp.concatenate([valid1, valid[s1:]], axis=0)

    return ObjectSet(
        points=points, valid=valid, class_id=class_id,
        present=present, track_id=track_id,
    )


def flatten_objects(objs: ObjectSet, capacity: int) -> Tuple[PointBuffer, jax.Array]:
    """Concatenate every fused object's points into one padded buffer
    (reference vstack at `vision_pipeline_utils.py:313-317`), compacting so
    valid rows are contiguous. Returns (buffer, overflow_count)."""
    from rt3d.geometry.ops import compact_points

    flat_pts = objs.points.reshape(-1, 3)
    flat_valid = (objs.valid & objs.present[:, None]).reshape(-1)
    return compact_points(flat_pts, flat_valid, capacity)
