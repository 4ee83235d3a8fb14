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
    _decode_packed,
    _quantize_packed,
    packed_cells,
)


def subtract_voxel_sets(
    workspace: PointBuffer,
    objects: PointBuffer,
    voxel_size: float,
    bound_m: float = DEFAULT_DEDUPE_BOUND_M,
) -> PointBuffer:
    """Keep workspace points whose voxel cell contains no object point."""
    kw, _, _ = _quantize_packed(workspace.points, workspace.valid,
                                voxel_size, bound_m)
    ko, _, _ = _quantize_packed(objects.points, objects.valid,
                                voxel_size, bound_m)
    n, m = kw.shape[0], ko.shape[0]
    keys = jnp.concatenate([ko, kw])
    is_obj = jnp.concatenate([
        jnp.ones((m,), jnp.int32), jnp.zeros((n,), jnp.int32)
    ])
    src = jnp.arange(n + m, dtype=jnp.int32)
    # stable sort on key alone keeps objects (which come first in the
    # concat) ahead of workspace rows inside each equal-key run
    sk, st, si = jax.lax.sort((keys, is_obj, src), num_keys=1, is_stable=True)
    start = jnp.logical_not(sk == jnp.roll(sk, 1)).at[0].set(True)

    def comb(a, b):
        return (jnp.where(b[1], b[0], a[0] | b[0]), a[1] | b[1])

    or_incl, _ = jax.lax.associative_scan(comb, (st, start.astype(jnp.int32)))
    poisoned = or_incl > 0  # run contains an object voxel (objects lead)

    # back to input order: one more sort keyed by the original index
    _, poisoned_in_order = jax.lax.sort(
        (si, poisoned.astype(jnp.int32)), num_keys=1
    )
    keep_ws = (poisoned_in_order[m:] == 0) & workspace.valid
    return PointBuffer(points=workspace.points, valid=keep_ws)


@struct.dataclass
class VoxelAccumulator:
    """Fixed-capacity persistent voxel set with per-voxel weights."""

    keys: jax.Array    # (CAP,) int32, sorted ascending, sentinel = empty
    weight: jax.Array  # (CAP,) f32

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]

    @staticmethod
    def empty(capacity: int) -> "VoxelAccumulator":
        return VoxelAccumulator(
            keys=jnp.full((capacity,), _INT_SENTINEL, jnp.int32),
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
    cap = acc.capacity
    k_new, _, _ = _quantize_packed(points, valid, voxel_size, bound_m)
    keys = jnp.concatenate([acc.keys, k_new])
    w = jnp.concatenate([
        acc.weight * decay,
        jnp.where(k_new != _INT_SENTINEL, obs_weight, 0.0),
    ])
    sk, sw = jax.lax.sort((keys, w), num_keys=1, is_stable=True)
    start = jnp.logical_not(sk == jnp.roll(sk, 1)).at[0].set(True)

    # segmented sum of weights over equal-key runs
    def comb(a, b):
        return (jnp.where(b[1], b[0], a[0] + b[0]), a[1] | b[1])

    sum_incl, _ = jax.lax.associative_scan(
        comb, (sw, start.astype(jnp.int32))
    )
    # run totals live at run ends (position before the next run start)
    next_start = jnp.roll(start, -1).at[-1].set(True)
    emit = next_start & (sk != _INT_SENTINEL)
    total_unique = jnp.sum(emit.astype(jnp.int32))

    # keep the CAP highest-weight voxels: sort emitted rows by -weight,
    # truncate, then restore key order
    wk = jnp.where(emit, sum_incl, -1.0)
    _, k_by_w, w_by_w = jax.lax.sort((-wk, sk, sum_incl), num_keys=1,
                                     is_stable=True)
    kept_valid = jnp.arange(cap) < jnp.minimum(total_unique, cap)
    k_kept = jnp.where(kept_valid, k_by_w[:cap], _INT_SENTINEL)
    w_kept = jnp.where(kept_valid, w_by_w[:cap], 0.0)
    k_final, w_final = jax.lax.sort((k_kept, w_kept), num_keys=1,
                                    is_stable=True)
    overflow = jnp.maximum(total_unique - cap, 0)
    return VoxelAccumulator(keys=k_final, weight=w_final), overflow


def extract_accumulated(
    acc: VoxelAccumulator,
    voxel_size: float,
    bound_m: float = DEFAULT_DEDUPE_BOUND_M,
    min_weight: float = 1.0,
) -> PointBuffer:
    """Voxels with weight >= min_weight as a point buffer (robot frame)."""
    n = packed_cells(voxel_size, bound_m)
    half = (n - 1) // 2
    ok = (acc.keys != _INT_SENTINEL) & (acc.weight >= min_weight)
    pts = jnp.where(
        ok[:, None], _decode_packed(acc.keys, n, half, voxel_size), 0.0
    )
    return PointBuffer(points=pts, valid=ok)
