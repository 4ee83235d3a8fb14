"""Image-space mask ops: morphological erosion/dilation, random subsample.

Reference components covered:
* `erode_mask` (cv2 12x12 at `2cams_mask_cpu.py:54-57`, 10x10 at
  `1cam/rt-tracking.py:29-32`) — binary erosion to trim noisy mask borders.
* `erode_mask_gpu` (`vision_pipeline_utils.py:12-15`) — NOTE: the reference
  GPU variant thresholds `conv > 0`, which is a DILATION, and is only ever
  called commented-out (`2cams_mask_gpu.py:313,347`). We provide both a
  correct erosion and that dilation, named honestly.
* `random_sample_pointcloud` (`1cam/rt-tracking.py:54-68`) — keep a random
  fraction for cheap preview clouds (5% at `:272`).

All ops are jit-friendly: erosion is a min-pool (`reduce_window`), the
subsample uses a JAX PRNG key and a keep-mask (padded shapes preserved).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rt3d.geometry.ops import PointBuffer


def erode_mask(mask: jax.Array, kernel_size: int = 10) -> jax.Array:
    """Binary erosion with a square structuring element (cv2.erode
    semantics for an all-ones kernel: output 1 iff every kernel cell is 1).
    mask: (..., H, W) bool. Implemented as a min-pool (negated max
    reduce_window)."""
    k = kernel_size
    m = mask.astype(jnp.float32)
    out = -jax.lax.reduce_window(
        -m,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1,) * (mask.ndim - 2) + (k, k),
        window_strides=(1,) * mask.ndim,
        # padding cells take the -inf init -> +inf after negation, the min
        # identity: borders do NOT erode. This MATCHES cv2.erode's default
        # borderValue (morphologyDefaultBorderValue() = +DBL_MAX — verified
        # empirically: eroding an all-ones mask keeps its border pixels),
        # which is what the reference calls (`2cams_mask_cpu.py:56`).
        padding=[(0, 0)] * (mask.ndim - 2) + [(k // 2, (k - 1) // 2)] * 2,
    )
    return out >= 1.0


def dilate_mask(mask: jax.Array, kernel_size: int = 3) -> jax.Array:
    """Binary dilation (what the reference's `erode_mask_gpu` actually
    computes, `vision_pipeline_utils.py:15`)."""
    k = kernel_size
    m = mask.astype(jnp.float32)
    out = jax.lax.reduce_window(
        m,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1,) * (mask.ndim - 2) + (k, k),
        window_strides=(1,) * mask.ndim,
        padding=[(0, 0)] * (mask.ndim - 2) + [(k // 2, (k - 1) // 2)] * 2,
    )
    return out > 0.0


def random_subsample(
    buf: PointBuffer, fraction: float, key: jax.Array
) -> PointBuffer:
    """Keep ~fraction of valid points (reference keeps 5% for its Open3D
    preview, `1cam/rt-tracking.py:54-68,272`). Padded layout preserved."""
    u = jax.random.uniform(key, buf.valid.shape)
    return PointBuffer(points=buf.points, valid=buf.valid & (u < fraction))
