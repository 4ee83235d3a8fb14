"""Statistical outlier removal (SOR) on padded buffers.

Reproduces Open3D's ``remove_statistical_outlier(nb_neighbors, std_ratio)``
as used by the reference (`2cam/vision_pipeline_utils.py:48-58`):

* for each point, the mean distance to its ``nb_neighbors`` nearest
  neighbours — Open3D's KNN search includes the query point itself (distance
  0) and divides the summed distances by ``nb_neighbors - 1``, i.e. the mean
  over the ``nb_neighbors - 1`` true nearest neighbours;
* a point is kept iff its mean distance <= mu + std_ratio * sigma, where mu
  and sigma (unbiased, ddof=1) are computed over all points' mean distances.

TPU mapping: the pairwise distance matrix is computed with the
``|a|^2 + |b|^2 - 2 a.b`` matmul identity (MXU work), and the k smallest
entries per row come from ``jax.lax.top_k`` on negated distances. Shapes are
static; invalid rows carry +inf distances and are excluded from the
statistics.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from rt3d.geometry.ops import PointBuffer

_BIG = jnp.float32(3.4e38)


def pairwise_sqdist(a: jax.Array, b: jax.Array) -> jax.Array:
    """Squared Euclidean distances (Na, Nb) via the matmul identity."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)
    cross = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.maximum(a2 + b2.T - 2.0 * cross, 0.0)


def _smallest_k(d2: jax.Array, k: int) -> jax.Array:
    """The k smallest entries per row of a (N, M) matrix, ascending.

    `lax.top_k` lowers to a per-row sort on TPU (~7 ms for 2048x2048);
    for small k, k rounds of (min, argmin, mask-out) are pure VPU passes
    (~0.1 ms). Exact — ties broken by argmin's first-index rule."""
    n, m = d2.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)

    def body(carry, _):
        d2_c = carry
        idx = jnp.argmin(d2_c, axis=1)
        val = jnp.min(d2_c, axis=1)
        d2_c = jnp.where(cols == idx[:, None], _BIG, d2_c)
        return d2_c, val

    _, vals = jax.lax.scan(body, d2, None, length=k)
    return vals.T  # (N, k) ascending


def _knn_mean_xla(points, valid, k):
    n = points.shape[0]
    d2 = pairwise_sqdist(points, points)
    # invalid columns can never be neighbours
    d2 = jnp.where(valid[None, :], d2, _BIG)
    # self-distance is 0 and participates in the top-k (Open3D semantics);
    # make sure it is exactly 0 even with fp error.
    d2 = d2.at[jnp.diag_indices(n)].set(0.0)
    small = _smallest_k(d2, k)  # (N, k) smallest squared distances
    dists = jnp.sqrt(jnp.maximum(small, 0.0))
    # sum over the k nearest (incl. self at 0) / (k - 1) == mean over k-1
    # true neighbours — Open3D divides by (nb_neighbors - 1).
    mean_d = jnp.sum(jnp.where(dists < 1e18, dists, 0.0), axis=1) / jnp.maximum(k - 1, 1)
    # a row with fewer than k valid neighbours picked up +inf entries —
    # treat its mean as huge so it gets rejected, as Open3D would once the
    # cloud is too small to support the query.
    saturated = jnp.any(small >= _BIG * 0.5, axis=1)
    return mean_d, saturated


def sor_inlier_mask(
    points: jax.Array,
    valid: jax.Array,
    nb_neighbors: int = 20,
    std_ratio: float = 1.5,
    use_pallas: bool = True,
) -> jax.Array:
    """Boolean inlier mask over a padded (N, 3) cloud."""
    n = points.shape[0]
    k = min(nb_neighbors, n)
    if use_pallas and n >= 256:
        from rt3d.geometry.pallas_ops import pallas_available, sor_knn_mean_pallas

        if pallas_available():
            mean_d, saturated = sor_knn_mean_pallas(points, valid, k=k)
        else:
            mean_d, saturated = _knn_mean_xla(points, valid, k)
    else:
        mean_d, saturated = _knn_mean_xla(points, valid, k)
    mean_d = jnp.where(saturated, _BIG, mean_d)

    vf = valid & ~saturated
    nv = jnp.maximum(jnp.sum(vf.astype(jnp.float32)), 1.0)
    mu = jnp.sum(jnp.where(vf, mean_d, 0.0)) / nv
    var = jnp.sum(jnp.where(vf, (mean_d - mu) ** 2, 0.0)) / jnp.maximum(nv - 1.0, 1.0)
    sigma = jnp.sqrt(var)
    thresh = mu + std_ratio * sigma
    return valid & (mean_d <= thresh)


def sor_filter(
    buf: PointBuffer, nb_neighbors: int = 20, std_ratio: float = 1.5
) -> PointBuffer:
    """SOR that preserves the padded layout (rows keep their position; the
    `valid` mask shrinks). Compact afterwards if contiguity is needed."""
    keep = sor_inlier_mask(buf.points, buf.valid, nb_neighbors, std_ratio)
    return PointBuffer(points=buf.points, valid=keep)
