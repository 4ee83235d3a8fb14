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


def _chol_unrolled(s: jax.Array):
    """Batched Cholesky of a tiny (..., k, k) SPD matrix, unrolled at trace
    time (k is static, 2 or 4 here).

    Why not `jnp.linalg.cholesky`: on TPU it lowers to a Cholesky
    custom-call (plus TriangularSolve custom-calls for the solves), which
    the round-3 chip trace measured at ~0.16 ms/step for the tracker's
    vmapped 4x4 solves — dispatch-bound, unfusible. Unrolled
    Cholesky-Crout is ~k^3/3 elementwise ops over the slot batch: XLA
    fuses the whole thing into the surrounding tracker math. Returns the
    lower factor as a k x k list-of-lists of (...,)-shaped entries so the
    substitutions below stay in unrolled-scalar land (no gathers)."""
    k = s.shape[-1]
    l = [[None] * k for _ in range(k)]
    for i in range(k):
        for j in range(i + 1):
            acc = s[..., i, j]
            for m in range(j):
                acc = acc - l[i][m] * l[j][m]
            if i == j:
                l[i][j] = jnp.sqrt(acc)
            else:
                l[i][j] = acc / l[j][j]
    return l


def _forward_sub(l, b):
    """Solve L z = b with L from `_chol_unrolled`; b is a length-k list of
    broadcast-compatible arrays. Returns the same-shape list z."""
    k = len(l)
    z = [None] * k
    for i in range(k):
        acc = b[i]
        for m in range(i):
            acc = acc - l[i][m] * z[m]
        z[i] = acc / l[i][i]
    return z


def _backward_sub_t(l, y):
    """Solve L^T x = y (same list convention)."""
    k = len(l)
    x = [None] * k
    for i in reversed(range(k)):
        acc = y[i]
        for m in range(i + 1, k):
            acc = acc - l[m][i] * x[m]
        x[i] = acc / l[i][i]
    return x


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
    # z solves L z = d per (track, det); dist = |z|^2. Unrolled batched
    # Cholesky + forward substitution (no custom-calls — see _chol_unrolled)
    l = _chol_unrolled(s)  # entries (S,)
    lb = [[e[:, None] if e is not None else None for e in row] for row in l]
    z = _forward_sub(lb, [d[..., i] for i in range(d.shape[-1])])  # (S, D)
    return sum(zi * zi for zi in z)


def kalman_update(
    mean: jax.Array, cov: jax.Array, measurement: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Measurement update with an xyah observation. Batched over leading dims."""
    proj_mean, s = _project(mean, cov)
    # K = P H^T S^-1 via Cholesky solve (S is 4x4 SPD). Unrolled batched
    # Cholesky + forward/backward substitution instead of
    # cholesky/cho_solve custom-calls (see _chol_unrolled).
    pht = cov[..., :, :4]  # P H^T since H = [I 0]
    l = _chol_unrolled(s)  # entries (...,)
    lb = [[e[..., None] if e is not None else None for e in row] for row in l]
    # solve S K^T = (P H^T)^T: rows of the rhs are pht's columns, (..., 8)
    y = _forward_sub(lb, [pht[..., i] for i in range(4)])
    x = _backward_sub_t(lb, y)
    k = jnp.stack(x, axis=-1)  # (..., 8, 4)
    innov = measurement - proj_mean
    new_mean = mean + jnp.einsum("...ij,...j->...i", k, innov)
    new_cov = cov - jnp.einsum("...ij,...jk,...lk->...il", k, s, k)
    return new_mean, new_cov
