"""Constant-velocity Kalman filter over xyah box state, batched over slots.

The classic ByteTrack/DeepSORT `KalmanFilterXYAH`: state is
[x, y, a, h, vx, vy, va, vh] (box centre, aspect ratio w/h, height and
velocities), observation is [x, y, a, h]. Noise scales with box height
(std_weight_position = 1/20, std_weight_velocity = 1/160). All ops are
tiny 8x8 algebra vmapped across the fixed track-slot axis.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

STD_POS = 1.0 / 20
STD_VEL = 1.0 / 160

_F = jnp.eye(8, dtype=jnp.float32) + jnp.eye(8, k=4, dtype=jnp.float32)  # motion
_H = jnp.eye(4, 8, dtype=jnp.float32)  # observation


def xyxy_to_xyah(boxes: jax.Array) -> jax.Array:
    """(..., 4) xyxy -> xyah (centre x, centre y, w/h, h)."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    x = boxes[..., 0] + w / 2
    y = boxes[..., 1] + h / 2
    a = w / jnp.maximum(h, 1e-6)
    return jnp.stack([x, y, a, h], axis=-1)


def xyah_to_xyxy(xyah: jax.Array) -> jax.Array:
    x, y, a, h = xyah[..., 0], xyah[..., 1], xyah[..., 2], xyah[..., 3]
    w = a * h
    return jnp.stack([x - w / 2, y - h / 2, x + w / 2, y + h / 2], axis=-1)


def kalman_initiate(measurement: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """New track state from an xyah measurement. Batched over leading dims."""
    mean = jnp.concatenate([measurement, jnp.zeros_like(measurement)], axis=-1)
    h = measurement[..., 3]
    std = jnp.stack(
        [
            2 * STD_POS * h, 2 * STD_POS * h, jnp.full_like(h, 1e-2), 2 * STD_POS * h,
            10 * STD_VEL * h, 10 * STD_VEL * h, jnp.full_like(h, 1e-5), 10 * STD_VEL * h,
        ],
        axis=-1,
    )
    cov = jnp.eye(8) * (std[..., None] ** 2)
    return mean, cov


def kalman_predict(mean: jax.Array, cov: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """One constant-velocity step. Batched over leading dims."""
    h = mean[..., 3]
    std = jnp.stack(
        [
            STD_POS * h, STD_POS * h, jnp.full_like(h, 1e-2), STD_POS * h,
            STD_VEL * h, STD_VEL * h, jnp.full_like(h, 1e-5), STD_VEL * h,
        ],
        axis=-1,
    )
    q = jnp.eye(8) * (std[..., None] ** 2)
    new_mean = jnp.einsum("ij,...j->...i", _F, mean)
    new_cov = jnp.einsum("ij,...jk,lk->...il", _F, cov, _F) + q
    return new_mean, new_cov


def _project(mean: jax.Array, cov: jax.Array):
    h = mean[..., 3]
    std = jnp.stack(
        [STD_POS * h, STD_POS * h, jnp.full_like(h, 1e-1), STD_POS * h], axis=-1
    )
    r = jnp.eye(4) * (std[..., None] ** 2)
    proj_mean = mean[..., :4]
    proj_cov = jnp.einsum("ij,...jk,lk->...il", _H, cov, _H) + r
    return proj_mean, proj_cov


def gating_distance(
    mean: jax.Array,          # (S, 8) predicted track means
    cov: jax.Array,           # (S, 8, 8) predicted track covariances
    measurements: jax.Array,  # (D, 4) xyah detections
    only_position: bool = False,
) -> jax.Array:
    """Squared Mahalanobis distance of every measurement to every track's
    PREDICTED measurement distribution — DeepSORT's
    `KalmanFilter.gating_distance`. Returns (S, D) f32.

    `only_position` restricts the metric to (x, y) — 2 degrees of freedom —
    matching DeepSORT's default gating; the full 4-dof form also penalizes
    aspect/height disagreement."""
    proj_mean, s = _project(mean, cov)  # (S, 4), (S, 4, 4)
    if only_position:
        proj_mean, s = proj_mean[..., :2], s[..., :2, :2]
        measurements = measurements[..., :2]
    d = measurements[None, :, :] - proj_mean[:, None, :]  # (S, D, k)
    chol = jnp.linalg.cholesky(s)  # (S, k, k)
    # z solves L z = d  per (track, det); dist = |z|^2
    z = jax.vmap(
        lambda l, ds: jax.scipy.linalg.solve_triangular(l, ds.T, lower=True)
    )(chol, d)  # (S, k, D)
    return jnp.sum(z * z, axis=-2)


def kalman_update(
    mean: jax.Array, cov: jax.Array, measurement: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Measurement update with an xyah observation. Batched over leading dims."""
    proj_mean, s = _project(mean, cov)
    # K = P H^T S^-1 via Cholesky solve (S is 4x4 SPD)
    pht = cov[..., :, :4]  # P H^T since H = [I 0]
    chol = jnp.linalg.cholesky(s)
    kt = jax.scipy.linalg.cho_solve((chol, True), jnp.swapaxes(pht, -1, -2))
    k = jnp.swapaxes(kt, -1, -2)  # (..., 8, 4)
    innov = measurement - proj_mean
    new_mean = mean + jnp.einsum("...ij,...j->...i", k, innov)
    new_cov = cov - jnp.einsum("...ij,...jk,...lk->...il", k, s, k)
    return new_mean, new_cov
