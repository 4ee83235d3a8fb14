"""Core padded-buffer point-cloud ops (backprojection, voxel dedupe, crop).

Design notes (TPU-first, not a translation of the reference):

* The reference back-projects by *gathering* depth at `torch.nonzero(mask)`
  indices (`2cam/vision_pipeline_utils.py:19-36`).  On TPU we instead compute
  the back-projection **densely over the whole pixel grid once per camera**
  (pure VPU elementwise work) and treat instance masks as validity planes.
  This keeps every shape static and lets one computation be shared by all
  detections in the frame.

* The reference voxel-downsamples with `round(pc/voxel)*voxel` followed by
  `torch.unique(dim=0)` (`vision_pipeline_utils.py:40-44`), a data-dependent
  shape. We reproduce the exact same voxel semantics (round-half-to-even,
  lexicographically sorted unique output) with ONE shared lexicographic sort
  of quantized voxel keys per camera per frame; every detection's dedupe then
  rides on that sort as a segmented "first-masked-element-per-run" scan.

* Compaction into fixed-capacity output buffers uses cumsum + out-of-bounds
  dropping scatter, so overflow beyond the configured capacity degrades
  gracefully (points dropped, overflow count reported) instead of erroring.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

_INT_SENTINEL = jnp.iinfo(jnp.int32).max


@struct.dataclass
class PointBuffer:
    """A padded point cloud: fixed capacity, `valid` marks live rows.

    Invariant maintained by all producers in this module: valid rows are
    contiguous at the front (rows `0..count-1`), so ``count`` alone describes
    occupancy and downstream kernels can early-out on tile granularity.
    """

    points: jax.Array  # (N, 3) float32
    valid: jax.Array   # (N,) bool

    @property
    def capacity(self) -> int:
        return self.points.shape[-2]

    @property
    def count(self) -> jax.Array:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)

    @staticmethod
    def empty(capacity: int, dtype=jnp.float32) -> "PointBuffer":
        return PointBuffer(
            points=jnp.zeros((capacity, 3), dtype=dtype),
            valid=jnp.zeros((capacity,), dtype=bool),
        )

    @staticmethod
    def from_dense(points: jax.Array, valid: Optional[jax.Array] = None) -> "PointBuffer":
        if valid is None:
            valid = jnp.ones(points.shape[:-1], dtype=bool)
        return PointBuffer(points=points.astype(jnp.float32), valid=valid)


# ---------------------------------------------------------------------------
# Back-projection & rigid transforms
# ---------------------------------------------------------------------------


def backproject_depth_grid(
    depth: jax.Array,
    fx: jax.Array | float,
    fy: jax.Array | float,
    cx: jax.Array | float,
    cy: jax.Array | float,
) -> Tuple[jax.Array, jax.Array]:
    """Dense pinhole back-projection of a (H, W) depth map.

    Returns ``(xyz, valid)`` with ``xyz: (H, W, 3)`` in the camera frame and
    ``valid: (H, W)`` false where depth is <= 0 / NaN / Inf — the same
    validity rule as the reference gather path
    (`vision_pipeline_utils.py:26`), applied densely.
    """
    h, w = depth.shape
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    z = depth.astype(jnp.float32)
    valid = (z > 0) & jnp.isfinite(z)
    zs = jnp.where(valid, z, 0.0)
    x = (u - cx) * zs / fx
    y = (v - cy) * zs / fy
    return jnp.stack([x, y, zs], axis=-1), valid


def rigid_transform(points: jax.Array, rotation: jax.Array, translation: jax.Array) -> jax.Array:
    """p -> R @ p + t over the last axis (reference `torch.mm(R, p.T).T + t`,
    `vision_pipeline_utils.py:239-240` and the transposed form `:301`).

    Full f32 precision: geometry must not ride the default bf16 matmul path
    (a 3-wide contraction costs nothing on the MXU either way)."""
    rt = jnp.matmul(
        points, rotation.T.astype(points.dtype),
        precision=jax.lax.Precision.HIGHEST,
    )
    return rt + translation.astype(points.dtype)


def aabb_mask(
    points: jax.Array,
    x_bounds: Tuple[float, float],
    y_bounds: Tuple[float, float],
    z_bounds: Tuple[float, float],
) -> jax.Array:
    """Inclusive axis-aligned bounding-box membership
    (reference `crop_point_cloud_gpu`, `vision_pipeline_utils.py:78-84`)."""
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    return (
        (x >= x_bounds[0]) & (x <= x_bounds[1])
        & (y >= y_bounds[0]) & (y <= y_bounds[1])
        & (z >= z_bounds[0]) & (z <= z_bounds[1])
    )


def masked_centroid(points: jax.Array, valid: jax.Array) -> jax.Array:
    """Mean over valid rows (reference `calculate_centroid`,
    `vision_pipeline_utils.py:74-75`). Returns zeros for empty clouds."""
    vf = valid.astype(points.dtype)[..., None]
    n = jnp.maximum(jnp.sum(vf, axis=-2), 1.0)
    return jnp.sum(points * vf, axis=-2) / n


# ---------------------------------------------------------------------------
# Compaction
# ---------------------------------------------------------------------------


def compact_points(
    points: jax.Array, emit: jax.Array, capacity: int
) -> Tuple[PointBuffer, jax.Array]:
    """Stream-compact rows of ``points`` where ``emit`` into a fixed-capacity
    buffer. Returns ``(buffer, overflow_count)``. Valid rows are contiguous.

    Gather-based (searchsorted over the emit prefix-sum) rather than
    scatter-based: under `vmap` a scatter of the full source array per batch
    element makes XLA materialize a (D, N, 3) broadcast of the updates —
    ~19 GB at HD720 x 20 detections. The gather form shares the source.
    """
    n = points.shape[0]
    c = jnp.cumsum(emit.astype(jnp.int32))
    total = c[-1] if n > 0 else jnp.int32(0)
    # index of the j-th emitted row = first i with cumsum[i] == j+1
    idx = jnp.searchsorted(c, jnp.arange(1, capacity + 1, dtype=jnp.int32))
    count = jnp.minimum(total, capacity)
    valid = jnp.arange(capacity) < count
    out = jnp.where(
        valid[:, None], points[jnp.clip(idx, 0, n - 1)], 0.0
    ).astype(points.dtype)
    overflow = jnp.maximum(total - capacity, 0)
    return PointBuffer(points=out, valid=valid), overflow


# ---------------------------------------------------------------------------
# Voxel downsampling (exact `round(p/v)*v` + unique semantics)
# ---------------------------------------------------------------------------


def _quantize(points: jax.Array, valid: jax.Array, voxel_size: float):
    """Quantize to int32 voxel indices; invalid rows get the int sentinel so
    they sort to the end. `jnp.round` is round-half-to-even, matching
    `torch.round` in the reference (`vision_pipeline_utils.py:42`)."""
    q = jnp.round(points.astype(jnp.float32) / voxel_size).astype(jnp.int32)
    qx = jnp.where(valid, q[..., 0], _INT_SENTINEL)
    qy = jnp.where(valid, q[..., 1], _INT_SENTINEL)
    qz = jnp.where(valid, q[..., 2], _INT_SENTINEL)
    return qx, qy, qz


def _run_starts(sx, sy, sz):
    """Boundary flags of equal-key runs in lexicographically sorted keys."""
    same = (
        (sx == jnp.roll(sx, 1)) & (sy == jnp.roll(sy, 1)) & (sz == jnp.roll(sz, 1))
    )
    return jnp.logical_not(same).at[0].set(True)


def voxel_downsample(
    points: jax.Array,
    valid: jax.Array,
    voxel_size: float,
    capacity: int,
) -> Tuple[PointBuffer, jax.Array]:
    """Exact voxel-grid downsample of one padded cloud.

    Semantics match the reference `downsample_point_cloud_gpu`
    (`vision_pipeline_utils.py:40-44`): each surviving point is
    ``round(p/voxel)*voxel``, output is the unique set in lexicographic
    order. Implemented as sort + run-head emit + compaction (shapes static).
    """
    n = points.shape[0]
    qx, qy, qz = _quantize(points, valid, voxel_size)
    sx, sy, sz = jax.lax.sort((qx, qy, qz), num_keys=3)
    starts = _run_starts(sx, sy, sz)
    emit = starts & (sx != _INT_SENTINEL)
    snapped = (
        jnp.stack([sx, sy, sz], axis=-1).astype(jnp.float32) * voxel_size
    )
    return compact_points(snapped, emit, capacity)


def voxel_downsample_masks(
    points: jax.Array,
    valid: jax.Array,
    masks: jax.Array,
    voxel_size: float,
    capacity: int,
) -> Tuple[PointBuffer, jax.Array]:
    """Voxel-downsample D masked subsets of one dense cloud with ONE sort.

    ``points: (N, 3)``, ``valid: (N,)``, ``masks: (D, N)`` bool. Returns a
    batched ``PointBuffer`` with leading dim D (and per-detection overflow
    counts). For each detection d, the output is exactly
    ``unique(round(points[masks[d] & valid]/voxel))*voxel`` in lexicographic
    order — the per-object downsample of the reference mask path
    (`vision_pipeline_utils.py:292-304`) for every object at once.

    The sort of the quantized keys is shared across detections (keys don't
    depend on d); per-detection dedupe is a segmented first-masked-in-run
    scan over the sorted order.
    """
    n = points.shape[0]
    d = masks.shape[0]
    qx, qy, qz = _quantize(points, valid, voxel_size)
    order = jnp.arange(n, dtype=jnp.int32)
    sx, sy, sz, sorder = jax.lax.sort((qx, qy, qz, order), num_keys=3)
    starts = _run_starts(sx, sy, sz)
    key_ok = sx != _INT_SENTINEL

    masks_sorted = jnp.take(masks, sorder, axis=1)  # (D, N)
    m_i = masks_sorted.astype(jnp.int32)
    inclusive = jnp.cumsum(m_i, axis=1)
    # Count of masked elements before the current run, forward-filled from
    # run starts (values at successive run starts are non-decreasing, so a
    # running max implements the fill).
    base_at_start = jnp.where(starts[None, :], inclusive - m_i, -1)
    base = jax.lax.cummax(base_at_start, axis=1)
    within = inclusive - base
    emit = masks_sorted & (within == 1) & key_ok[None, :]

    snapped = jnp.stack([sx, sy, sz], axis=-1).astype(jnp.float32) * voxel_size

    def _compact_one(emit_d):
        return compact_points(snapped, emit_d, capacity)

    buf, overflow = jax.vmap(_compact_one)(emit)
    return buf, overflow
