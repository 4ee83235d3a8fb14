"""Voxel-set operations: set-difference subtraction and persistent
accumulation (TSDF-style workspace memory).

* `subtract_voxel_sets` reimplements the reference's `voxel_grid_subtract`
  (`2cam/2cams_mask_cpu.py:290-309`): voxelize both clouds, drop workspace
  voxels whose cell appears in the object set. The reference does a Python
  set difference of tuples; here it is a sort-merge: concatenate tagged
  keys, one stable sort (objects ordered before workspace rows within a
  voxel run), a segmented prefix-OR of the object tag, and a sort back to
  input order. No scatters, no host round trips.

* `VoxelAccumulator` is the stretch-config "persistent TSDF-style
  workspace accumulation" (BASELINE.json config 5): a fixed-capacity
  sorted voxel set with per-voxel weights, updated per frame by sort-merge
  (exponential decay + new-observation increment), queryable as a point
  buffer above a weight threshold. The reference has no equivalent — its
  workspace cloud is rebuilt from scratch every frame.

Voxel identity here is the TWO-WORD packed key (`ops._quantize_packed2`):
``hi = (qx+half)*n + (qy+half)``, ``lo = qz + half``. One encoding for
every voxel size — it fits int32 out to ~23 m bounds even at the 1 mm
stretch voxel, where the single-word key overflows — at the cost of one
extra sort operand (~40%/operand, NOTES.md) on ops that are far off the
per-frame critical path at 5 mm.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from rt3d.geometry.ops import (
    DEFAULT_DEDUPE_BOUND_M,
    PointBuffer,
    _INT_SENTINEL,
    _decode_packed2,
    _pair_run_starts,
    _quantize_packed2,
    packed2_fits,
    packed_cells,
    segmented_or_scan,
    segmented_sum_scan,
)


def _check_fits(voxel_size: float, bound_m: float, what: str) -> None:
    if not packed2_fits(voxel_size, bound_m):
        raise ValueError(
            f"{what}: voxel_size={voxel_size} with bound_m={bound_m} "
            "overflows even the two-word packed voxel grid "
            "(needs cells_per_axis^2 < 2^31); tighten the bound or coarsen "
            "the voxel"
        )


def subtract_voxel_sets(
    workspace: PointBuffer,
    objects: PointBuffer,
    voxel_size: float,
    bound_m: float = DEFAULT_DEDUPE_BOUND_M,
) -> PointBuffer:
    """Keep workspace points whose voxel cell contains no object point."""
    _check_fits(voxel_size, bound_m, "subtract_voxel_sets")
    wh, wl, _, _ = _quantize_packed2(workspace.points, workspace.valid,
                                     voxel_size, bound_m)
    oh, ol, _, _ = _quantize_packed2(objects.points, objects.valid,
                                     voxel_size, bound_m)
    n, m = wh.shape[0], oh.shape[0]
    hi = jnp.concatenate([oh, wh])
    lo = jnp.concatenate([ol, wl])
    src = jnp.arange(n + m, dtype=jnp.int32)
    # src rides as a third SORT KEY, not a stable-sort payload: it is
    # unique (total order => the unstable sort is deterministic) and
    # objects occupy src < m, so within an equal-key run objects still
    # sort first. Drops the separate is_obj operand a stable sort would
    # need (each operand ~+40%, NOTES.md) — the tag is recovered from si.
    shi, slo, si = jax.lax.sort((hi, lo, src), num_keys=3, is_stable=False)
    st = (si < m).astype(jnp.int32)
    start = _pair_run_starts(shi, slo)

    # contiguous-shift segmented OR (associative_scan's odd/even recursion
    # would lower to strided-slice gathers, ops.segmented_or_scan doc)
    or_incl = segmented_or_scan(st, start)
    poisoned = or_incl > 0  # run contains an object voxel (objects lead)

    # back to input order: one more sort keyed by the original index
    _, poisoned_in_order = jax.lax.sort(
        (si, poisoned.astype(jnp.int32)), num_keys=1, is_stable=False
    )
    keep_ws = (poisoned_in_order[m:] == 0) & workspace.valid
    return PointBuffer(points=workspace.points, valid=keep_ws)


@struct.dataclass
class VoxelAccumulator:
    """Fixed-capacity persistent voxel set with per-voxel weights.

    Keys are the two-word packed voxel id, kept (hi, lo)-sorted ascending;
    sentinel in both words marks an empty slot.
    """

    keys_hi: jax.Array  # (CAP,) int32, sorted ascending, sentinel = empty
    keys_lo: jax.Array  # (CAP,) int32
    weight: jax.Array   # (CAP,) f32

    @property
    def capacity(self) -> int:
        return self.keys_hi.shape[0]

    @staticmethod
    def empty(capacity: int) -> "VoxelAccumulator":
        return VoxelAccumulator(
            keys_hi=jnp.full((capacity,), _INT_SENTINEL, jnp.int32),
            keys_lo=jnp.full((capacity,), _INT_SENTINEL, jnp.int32),
            weight=jnp.zeros((capacity,), jnp.float32),
        )


def accumulate_voxels(
    acc: VoxelAccumulator,
    points: jax.Array,
    valid: jax.Array,
    voxel_size: float,
    bound_m: float = DEFAULT_DEDUPE_BOUND_M,
    decay: float = 0.98,
    obs_weight: float = 1.0,
) -> Tuple[VoxelAccumulator, jax.Array]:
    """Fold one frame's (already downsampled) cloud into the accumulator.

    Existing voxel weights decay by `decay`; observed voxels gain
    `obs_weight`. When the merged set exceeds capacity, the lowest-weight
    voxels are evicted (overflow count returned).
    """
    _check_fits(voxel_size, bound_m, "accumulate_voxels")
    cap = acc.capacity
    nh, nl, _, _ = _quantize_packed2(points, valid, voxel_size, bound_m)
    hi = jnp.concatenate([acc.keys_hi, nh])
    lo = jnp.concatenate([acc.keys_lo, nl])
    w = jnp.concatenate([
        acc.weight * decay,
        jnp.where(nh != _INT_SENTINEL, obs_weight, 0.0),
    ])
    # unstable: the segmented sum below is order-independent within a run
    shi, slo, sw = jax.lax.sort((hi, lo, w), num_keys=2, is_stable=False)
    start = _pair_run_starts(shi, slo)

    # segmented sum of weights over equal-key runs — contiguous-shift form
    # (associative_scan gathers at this width, ops.segmented_sum_scan doc)
    sum_incl = segmented_sum_scan(sw, start)
    # run totals live at run ends (position before the next run start)
    next_start = jnp.roll(start, -1).at[-1].set(True)
    emit = next_start & (shi != _INT_SENTINEL)
    total_unique = jnp.sum(emit.astype(jnp.int32))

    # Two ways back to a (cap,) key-ordered buffer, selected at runtime:
    # the steady state (everything fits) is ONE ordered compaction sort;
    # eviction (overflow frames only) pays the stable sort by -weight,
    # truncation, and a key re-sort. At the 1 mm stretch scale the merged
    # array is ~2 M rows, so skipping the 5-operand stable sort + 3-operand
    # re-sort on every non-overflowing frame is the difference between the
    # accumulate being ~1 sort and ~3 sorts per frame.
    def _no_evict(shi, slo, sum_incl, emit):
        # emitted runs carry unique ascending (hi, lo) keys, so a
        # sentinel-masked re-sort IS the order-preserving compaction: 3
        # operands (2 keys + weight), where compact_scalars' rank key
        # would make it 4 — at the 2 M-row stretch scale each operand is
        # ~40% of a sort (NOTES.md). Sentinel rows sort last and carry
        # weight 0, so truncating to cap is the final buffer directly.
        hm = jnp.where(emit, shi, _INT_SENTINEL)
        lm = jnp.where(emit, slo, _INT_SENTINEL)
        wm = jnp.where(emit, sum_incl, 0.0)
        h2, l2, w2 = jax.lax.sort((hm, lm, wm), num_keys=2, is_stable=False)
        return h2[:cap], l2[:cap], w2[:cap]

    def _evict(shi, slo, sum_incl, emit):
        # keep the CAP highest-weight voxels: sort emitted rows by -weight
        # with (hi, lo) as tiebreak KEYS — emitted rows have unique key
        # pairs, so the 3-key unstable sort reproduces the stable-sort
        # result (ties resolve to ascending key order, which IS the
        # pre-sort order) without the stable sort's hidden iota operand.
        # Non-emitted rows (weight key -1 -> sorts last, possibly with
        # duplicate key pairs) land beyond [:cap] in this branch
        # (total_unique > cap), so their unstable order never surfaces.
        wk = jnp.where(emit, sum_incl, -1.0)
        _, h_by_w, l_by_w, w_by_w = jax.lax.sort(
            (-wk, shi, slo, sum_incl), num_keys=3, is_stable=False
        )
        kept_valid = jnp.arange(cap) < jnp.minimum(total_unique, cap)
        h_kept = jnp.where(kept_valid, h_by_w[:cap], _INT_SENTINEL)
        l_kept = jnp.where(kept_valid, l_by_w[:cap], _INT_SENTINEL)
        w_kept = jnp.where(kept_valid, w_by_w[:cap], 0.0)
        return jax.lax.sort(
            (h_kept, l_kept, w_kept), num_keys=2, is_stable=False
        )

    h_final, l_final, w_final = jax.lax.cond(
        total_unique <= cap, _no_evict, _evict, shi, slo, sum_incl, emit
    )
    overflow = jnp.maximum(total_unique - cap, 0)
    return (
        VoxelAccumulator(keys_hi=h_final, keys_lo=l_final, weight=w_final),
        overflow,
    )


def extract_accumulated(
    acc: VoxelAccumulator,
    voxel_size: float,
    bound_m: float = DEFAULT_DEDUPE_BOUND_M,
    min_weight: float = 1.0,
) -> PointBuffer:
    """Voxels with weight >= min_weight as a point buffer (robot frame)."""
    n = packed_cells(voxel_size, bound_m)
    half = (n - 1) // 2
    ok = (acc.keys_hi != _INT_SENTINEL) & (acc.weight >= min_weight)
    pts = jnp.where(
        ok[:, None],
        _decode_packed2(acc.keys_hi, acc.keys_lo, n, half, voxel_size),
        0.0,
    )
    return PointBuffer(points=pts, valid=ok)
