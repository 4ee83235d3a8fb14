"""Workspace - objects subtraction: per-row min distance thresholding.

Reference (`2cam/vision_pipeline_utils.py:168-187`) materializes the full
``torch.cdist(workspace, objects)`` matrix — O(N*M) memory it even logs
(`:177`). Here the min-distance reduction is **fused into the distance
computation** so the full matrix never exists: the object buffer is processed
in column tiles, each tile contributing `min(|w|^2 + |o|^2 - 2 w.o)` (an MXU
matmul + VPU row-min) into a running minimum. An optional Pallas kernel
(`rt3d.geometry.pallas_ops`) implements the same contraction with explicit
VMEM tiling for the benchmark path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rt3d.geometry.ops import PointBuffer

_BIG = jnp.float32(3.4e38)


def min_sqdist_to_set(
    queries: jax.Array,
    query_valid: jax.Array,
    refs: jax.Array,
    ref_valid: jax.Array,
    tile: int = 2048,
) -> jax.Array:
    """For each query row, squared distance to the nearest valid ref point.

    Shapes: queries (N,3), refs (M,3). Returns (N,) f32; +BIG where there are
    no valid refs in a tile (the running min over all tiles is still correct
    because invalid refs contribute +BIG).
    """
    n = queries.shape[0]
    m = refs.shape[0]
    tile = min(tile, m)
    num_tiles = -(-m // tile)
    pad = num_tiles * tile - m
    refs_p = jnp.pad(refs.astype(jnp.float32), ((0, pad), (0, 0)))
    rv_p = jnp.pad(ref_valid, (0, pad))
    refs_t = refs_p.reshape(num_tiles, tile, 3)
    rv_t = rv_p.reshape(num_tiles, tile)

    q = queries.astype(jnp.float32)
    q2 = jnp.sum(q * q, axis=-1)  # (N,)

    def body(carry, xs):
        ref_tile, rv_tile = xs
        r2 = jnp.sum(ref_tile * ref_tile, axis=-1)  # (tile,)
        cross = jax.lax.dot_general(
            q, ref_tile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (N, tile)
        d2 = q2[:, None] + r2[None, :] - 2.0 * cross
        d2 = jnp.where(rv_tile[None, :], jnp.maximum(d2, 0.0), _BIG)
        return jnp.minimum(carry, jnp.min(d2, axis=1)), None

    init = jnp.full((n,), _BIG, dtype=jnp.float32)
    mind2, _ = jax.lax.scan(body, init, (refs_t, rv_t))
    return mind2


def subtract_min_dist(
    workspace: PointBuffer,
    objects: PointBuffer,
    distance_threshold: float,
    tile: int = 2048,
    use_pallas: bool = True,
) -> PointBuffer:
    """Keep workspace points farther than `distance_threshold` from every
    valid object point (reference `subtract_point_clouds_gpu`,
    `vision_pipeline_utils.py:168-187`). With zero valid object points all
    workspace points are kept (the reference would fault on the empty min —
    we define the sensible semantics and document the divergence).

    On TPU the contraction runs as a fused Pallas kernel (no HBM
    materialization of distance tiles); elsewhere the scanned XLA tiling."""
    if use_pallas:
        from rt3d.geometry.pallas_ops import min_sqdist_pallas, pallas_available

        if pallas_available():
            mind2 = min_sqdist_pallas(
                workspace.points, objects.points, objects.valid,
                threshold=float(distance_threshold),
            )
            keep = workspace.valid & (mind2 > jnp.float32(distance_threshold) ** 2)
            return PointBuffer(points=workspace.points, valid=keep)
    mind2 = min_sqdist_to_set(
        workspace.points, workspace.valid, objects.points, objects.valid, tile
    )
    keep = workspace.valid & (mind2 > jnp.float32(distance_threshold) ** 2)
    return PointBuffer(points=workspace.points, valid=keep)
